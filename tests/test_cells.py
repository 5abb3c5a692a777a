"""GridSpec: cell assignment bounds, covering explosion, Hilbert clustering."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from locus_spark.cells import GridSpec, cluster_by_hilbert, grid_from_points

finite = st.floats(
    min_value=-1e15, max_value=1e15, allow_nan=False, allow_infinity=False
)


@given(finite, finite, st.floats(min_value=1e-6, max_value=1e15), st.integers(2, 10))
def test_cell_xy_in_range(x0, y0, extent, res):
    g = GridSpec(x0, y0, x0 + extent, y0 + extent, res)
    for px, py in [(x0, y0), (x0 + extent, y0 + extent), (x0 + extent / 3, y0 + extent / 2)]:
        cx, cy = g.cell_xy_of(px, py)
        assert 0 <= cx < g.n and 0 <= cy < g.n


def test_degenerate_extent_single_cell():
    # degenerate-extent guard, mirroring /root/reference/locus/_core/segmental.py:195-200
    g = GridSpec(5.0, 5.0, 5.0, 5.0, 4)
    assert g.cell_xy_of(5.0, 5.0) == (0, 0)


def test_spark_cell_matches_scalar(spark):
    pts = [(i, float(i) * 3.7 - 50.0, float(i * i % 97) - 48.0) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    g = grid_from_points(df, resolution=4)
    rows = df.select(
        "id", "x", "y", g.cell_x_col(F.col("x")).alias("cx"), g.cell_y_col(F.col("y")).alias("cy")
    ).collect()
    for r in rows:
        assert (r.cx, r.cy) == g.cell_xy_of(r.x, r.y)


def test_covering_explode_counts(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 10.0, 0.0, 10.0), (2, 2.0, 2.5, 3.0, 3.5)],
        "id long, min_x double, max_x double, min_y double, max_y double",
    )
    g = GridSpec(0.0, 0.0, 10.0, 10.0, 2)  # 4x4 cells of size 2.5
    out = g.explode_covering(df, "min_x", "max_x", "min_y", "max_y")
    counts = {r.id: r.cnt for r in out.groupBy("id").agg(F.count("*").alias("cnt")).collect()}
    assert counts[1] == 16  # full grid
    assert counts[2] in (1, 2, 4)  # small box spans 1-2 cells per axis


def test_cluster_by_hilbert_adds_cols(spark):
    pts = [(i, float(i % 13), float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    g = grid_from_points(df, resolution=4)
    out = cluster_by_hilbert(df, g, num_partitions=4)
    assert {"cell", "hkey"} <= set(out.columns)
    assert out.count() == 100
    mx = out.agg(F.max("hkey")).collect()[0][0]
    assert 0 <= mx < g.n * g.n
