"""Persisted Hilbert-clustered layout: build-once/query-many parity and
scan-level pruning (the reference's Tree contract,
/root/reference/locus/kd.py:29-55 — build in __init__, many read-only
queries; subtree skip analogue /root/reference/locus/_core/r.py:164-172)."""

from __future__ import annotations

import contextlib
import io

import numpy as np

from locus_spark.cells import GridSpec, cluster_by_hilbert
from locus_spark.operators.points import find_box_join, find_box_over_layout


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_layout_query_parity_and_pushdown(spark, tmp_path):
    rng = np.random.RandomState(5)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(-80, 80, (3000, 2)))]
    pdf = spark.createDataFrame(pts, "id long, x double, y double")
    grid = GridSpec(-80.0, -80.0, 80.0, 80.0, 5)
    path = str(tmp_path / "layout")
    cluster_by_hilbert(pdf, grid, num_partitions=4).sortWithinPartitions("hkey").write.parquet(path)
    layout = spark.read.parquet(path)

    qb = spark.createDataFrame(
        [(0, -10.0, 5.0, -3.0, 12.0), (1, 40.0, 60.0, 40.0, 55.0)],
        "qid long, min_x double, max_x double, min_y double, max_y double",
    )
    out = find_box_over_layout(layout, qb, grid)
    got = {(r.qid, r.id) for r in out.collect()}
    want = {(r.qid, r.id) for r in find_box_join(pdf, qb, grid=grid).collect()}
    assert got == want and len(got) > 0

    # the cell IN-list must reach the parquet scan (row-group pruning)
    plan = _explain_str(out)
    assert "PushedFilters" in plan and "In(cell" in plan
