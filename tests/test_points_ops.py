"""Point-operator joins vs numpy brute force — same oracle style as the
reference suite (/root/reference/tests/kd_tests/*: soundness + completeness
for range search, distance equality for nearest, top-k set for n-nearest)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from locus_spark.cells import GridSpec
from locus_spark.operators.points import (
    find_ball_join,
    find_box_join,
    knn_join,
    nearest_join,
)

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


def _points_df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )


def _probes_df(spark, probes):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(probes)],
        "qid long, x double, y double",
    )


def _brute_knn(pts, probes, k):
    """{qid: [(dist2, id), ...] top-k with (dist2, id) ascending}"""
    out = {}
    arr = np.array(pts, dtype=np.float64)
    for qid, (qx, qy) in enumerate(probes):
        d2 = (arr[:, 0] - qx) ** 2 + (arr[:, 1] - qy) ** 2
        order = sorted(range(len(pts)), key=lambda i: (d2[i], i))[:k]
        out[qid] = [(d2[i], i) for i in order]
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=1, max_size=60),
    st.lists(st.tuples(coord, coord), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=2, max_value=5),
)
def test_knn_join_matches_brute(spark, pts, probes, k, res):
    got = knn_join(
        _points_df(spark, pts), _probes_df(spark, probes), k,
        grid=None if res % 2 else GridSpec(
            min(p[0] for p in pts), min(p[1] for p in pts),
            max(p[0] for p in pts), max(p[1] for p in pts), res),
    ).collect()
    want = _brute_knn(pts, probes, k)
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rn, r.dist2, r.id))
    assert set(by_q) == set(want)
    for qid, rows in by_q.items():
        rows.sort()
        assert [(d, i) for _, d, i in rows] == want[qid]


def test_knn_short_circuit_k_ge_size(spark):
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]
    probes = [(0.5, 0.5)]
    got = knn_join(_points_df(spark, pts), _probes_df(spark, probes), 10).collect()
    assert sorted(r.id for r in got) == [0, 1, 2]
    assert sorted(r.rn for r in got) == [1, 2, 3]


def test_knn_empty_points_raises(spark):
    empty = spark.createDataFrame([], "id long, x double, y double")
    with pytest.raises(ValueError):
        knn_join(empty, _probes_df(spark, [(0.0, 0.0)]), 1)


def test_nearest_duplicate_points_tie_by_id(spark):
    pts = [(1.0, 1.0), (1.0, 1.0), (5.0, 5.0)]
    got = nearest_join(_points_df(spark, pts), _probes_df(spark, [(1.0, 1.0)])).collect()
    assert len(got) == 1 and got[0].id == 0 and got[0].dist2 == 0.0


def test_knn_hot_cluster_skew(spark):
    """Regression for the hot-cell candidate explosion: half the points in one
    dense cluster, probes both inside and on the fringe — the cap-pruned
    cogroup path must still return the exact brute-force top-k."""
    rng = np.random.RandomState(7)
    hot = rng.uniform(-1.0, 1.0, size=(400, 2))
    cold = rng.uniform(-100.0, 100.0, size=(400, 2))
    pts = [tuple(map(float, p)) for p in np.vstack([hot, cold])]
    probes = [tuple(map(float, p)) for p in np.vstack([
        rng.uniform(-1.0, 1.0, size=(5, 2)),       # inside the hot cluster
        rng.uniform(1.5, 3.0, size=(5, 2)),        # fringe next to it
        rng.uniform(-100.0, 100.0, size=(5, 2)),   # sparse region
    ])]
    grid = GridSpec(-100.0, -100.0, 100.0, 100.0, 6)
    got = knn_join(_points_df(spark, pts), _probes_df(spark, probes), 3, grid=grid).collect()
    want = _brute_knn(pts, probes, 3)
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rn, r.dist2, r.id))
    assert set(by_q) == set(want)
    for qid, rows in by_q.items():
        rows.sort()
        assert [(d, i) for _, d, i in rows] == want[qid]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=1, max_size=80),
    st.lists(st.tuples(coord, coord, coord, coord), min_size=1, max_size=6),
)
def test_find_box_sound_and_complete(spark, pts, raw_boxes):
    boxes = [
        (qid, min(a, b), max(a, b) + 0.5, min(c, d), max(c, d) + 0.5)
        for qid, (a, b, c, d) in enumerate(raw_boxes)
    ]
    bdf = spark.createDataFrame(
        boxes, "qid long, min_x double, max_x double, min_y double, max_y double"
    )
    got = {(r.qid, r.id) for r in find_box_join(_points_df(spark, pts), bdf).collect()}
    want = {
        (qid, i)
        for qid, mnx, mxx, mny, mxy in boxes
        for i, (x, y) in enumerate(pts)
        if mnx <= x <= mxx and mny <= y <= mxy
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=1, max_size=80),
    st.lists(
        st.tuples(coord, coord, st.floats(min_value=0.0, max_value=1e6)),
        min_size=1,
        max_size=6,
    ),
)
def test_find_ball_sound_and_complete(spark, pts, circles):
    cdf = spark.createDataFrame(
        [(q, x, y, r) for q, (x, y, r) in enumerate(circles)],
        "qid long, x double, y double, r double",
    )
    got = {(r.qid, r.id) for r in find_ball_join(_points_df(spark, pts), cdf).collect()}
    want = {
        (qid, i)
        for qid, (cx, cy, r) in enumerate(circles)
        for i, (x, y) in enumerate(pts)
        if (x - cx) ** 2 + (y - cy) ** 2 <= r * r
    }
    assert got == want
