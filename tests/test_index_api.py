"""The Tree-analogue index classes: projection column sets, props, and the
max_children/auto-resolution knob — pins the reference's majority API surface
(projections: /root/reference/locus/kd.py:93-318, r.py:120-555,
segmental.py:143-737; props: kd.py:59-91, r.py:64-118, segmental.py:81-141;
max_children 2..65535: tests/r_tests/strategies.py:17-19)."""

from __future__ import annotations

import numpy as np
import pytest

from locus_spark.cells import GridSpec, TARGET_CELL_OCCUPANCY, resolution_for
from locus_spark.index import BoxIndex, PointIndex, SegmentIndex

GRID = GridSpec(-50.0, -50.0, 50.0, 50.0, 4)


@pytest.fixture(scope="module")
def pts_df(spark):
    rng = np.random.RandomState(3)
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(-40, 40, (60, 2)))],
        "id long, x double, y double",
    )


@pytest.fixture(scope="module")
def probes_df(spark):
    return spark.createDataFrame(
        [(0, 1.0, 2.0), (1, -20.0, 17.0)], "qid long, x double, y double"
    )


def test_point_index_props_and_projections(spark, pts_df, probes_df):
    idx = PointIndex(pts_df, grid=GRID)
    assert idx.points is pts_df
    assert idx.context == GRID
    assert idx.max_children == TARGET_CELL_OCCUPANCY

    items = idx.n_nearest_items(probes_df, 3)
    assert items.columns == ["qid", "id", "x", "y", "dist2", "rn"]
    got_items = {(r.qid, r.rn): (r.id, r.x, r.y) for r in items.collect()}

    indices = idx.n_nearest_indices(probes_df, 3)
    assert indices.columns == ["qid", "id", "rn"]
    assert {(r.qid, r.rn): r.id for r in indices.collect()} == {
        k: v[0] for k, v in got_items.items()
    }
    points = idx.n_nearest_points(probes_df, 3)
    assert points.columns == ["qid", "x", "y", "rn"]
    assert {(r.qid, r.rn): (r.x, r.y) for r in points.collect()} == {
        k: (v[1], v[2]) for k, v in got_items.items()
    }

    assert idx.nearest_item(probes_df).columns == ["qid", "id", "x", "y", "dist2"]
    assert idx.nearest_index(probes_df).columns == ["qid", "id"]
    assert idx.nearest_point(probes_df).columns == ["qid", "x", "y"]

    qb = spark.createDataFrame(
        [(0, -30.0, 30.0, -30.0, 30.0)],
        "qid long, min_x double, max_x double, min_y double, max_y double",
    )
    bi = idx.find_box_items(qb)
    assert bi.columns == ["qid", "id", "x", "y"]
    assert idx.find_box_indices(qb).columns == ["qid", "id"]
    assert idx.find_box_points(qb).columns == ["qid", "x", "y"]
    qc = spark.createDataFrame(
        [(0, 0.0, 0.0, 20.0)], "qid long, x double, y double, r double"
    )
    assert idx.find_ball_items(qc).columns == ["qid", "id", "x", "y", "dist2"]


def test_box_index_props_and_projections(spark, probes_df):
    rng = np.random.RandomState(4)
    raw = rng.uniform(-40, 40, (50, 4))
    bdf = spark.createDataFrame(
        [
            (i, float(min(a, b)), float(max(a, b)) + 0.5,
             float(min(c, d)), float(max(c, d)) + 0.5)
            for i, (a, b, c, d) in enumerate(raw)
        ],
        "id long, min_x double, max_x double, min_y double, max_y double",
    )
    idx = BoxIndex(bdf, grid=GRID)
    assert idx.boxes is bdf and idx.context == GRID
    geom = ["min_x", "max_x", "min_y", "max_y"]
    qb = spark.createDataFrame(
        [(0, -45.0, 45.0, -45.0, 45.0)],
        "qid long, min_x double, max_x double, min_y double, max_y double",
    )
    assert idx.find_subsets_items(qb).columns == ["qid", "id", *geom]
    assert idx.find_subsets_indices(qb).columns == ["qid", "id"]
    assert idx.find_subsets(qb).columns == ["qid", *geom]
    assert idx.find_supersets_items(qb).columns == ["qid", "id", *geom]
    assert idx.find_supersets_indices(qb).columns == ["qid", "id"]
    assert idx.find_supersets(qb).columns == ["qid", *geom]
    items = idx.n_nearest_items(probes_df, 2)
    assert items.columns == ["qid", "id", *geom, "dist2", "rn"]
    assert idx.n_nearest_indices(probes_df, 2).columns == ["qid", "id", "rn"]
    assert idx.n_nearest_boxes(probes_df, 2).columns == ["qid", *geom, "rn"]
    assert idx.nearest_item(probes_df).columns == ["qid", "id", *geom, "dist2"]
    assert idx.nearest_index(probes_df).columns == ["qid", "id"]
    assert idx.nearest_box(probes_df).columns == ["qid", *geom]


def test_segment_index_props_and_projections(spark, probes_df):
    rng = np.random.RandomState(6)
    raw = rng.uniform(-40, 40, (50, 4))
    sdf = spark.createDataFrame(
        [
            (i, float(a), float(c), float(a + abs(b) * 0.1 + 0.01),
             float(c + abs(d) * 0.1 + 0.01))
            for i, (a, b, c, d) in enumerate(raw)
        ],
        "id long, x1 double, y1 double, x2 double, y2 double",
    )
    idx = SegmentIndex(sdf, grid=GRID)
    assert idx.segments is sdf and idx.context == GRID
    geom = ["x1", "y1", "x2", "y2"]
    qs = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0)], "qid long, x1 double, y1 double, x2 double, y2 double"
    )
    assert idx.n_nearest_items(qs, 2).columns == ["qid", "id", *geom, "dist2", "rn"]
    assert idx.n_nearest_indices(qs, 2).columns == ["qid", "id", "rn"]
    assert idx.n_nearest_segments(qs, 2).columns == ["qid", *geom, "rn"]
    assert idx.nearest_item(qs).columns == ["qid", "id", *geom, "dist2"]
    assert idx.nearest_index(qs).columns == ["qid", "id"]
    assert idx.nearest_segment(qs).columns == ["qid", *geom]
    assert idx.n_nearest_to_point_items(probes_df, 2).columns == [
        "qid", "id", *geom, "dist2", "rn"
    ]
    assert idx.n_nearest_to_point_indices(probes_df, 2).columns == ["qid", "id", "rn"]
    assert idx.n_nearest_to_point_segments(probes_df, 2).columns == ["qid", *geom, "rn"]
    assert idx.nearest_to_point_item(probes_df).columns == ["qid", "id", *geom, "dist2"]
    assert idx.nearest_to_point_index(probes_df).columns == ["qid", "id"]
    assert idx.nearest_to_point_segment(probes_df).columns == ["qid", *geom]


def test_resolution_for_occupancy_bounds():
    """Auto-resolution keeps mean occupancy in (target/4, target] in the
    unclamped range — the max_children invariant as n grows."""
    for target in (4, 16, 64):
        for n in (10_000, 1_000_000, 100_000_000):
            res = resolution_for(n, target=target)
            occ = n / float(4**res)
            if 4 < res < 16:  # outside the clamp
                assert occ <= target
                assert occ > target / 4.0


def test_point_index_auto_resolution_scales(spark):
    rng = np.random.RandomState(9)
    small = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 1, (300, 2)))],
        "id long, x double, y double",
    )
    big = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 1, (30_000, 2)))],
        "id long, x double, y double",
    )
    r_small = PointIndex(small, grid=None).context.resolution
    r_big = PointIndex(big, grid=None).context.resolution
    assert r_big > r_small
    # tighter occupancy knob → finer grid at the same n
    r_tight = PointIndex(big, grid=None, target_occupancy=2).context.resolution
    assert r_tight > r_big
