"""Grid DBSCAN (operators/density.py): brute-force parity on an
adversarial fixture, core/border/noise semantics, and the cell-join
completeness guarantee at cell boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from locus_spark.operators.density import dbscan, eps_neighbor_pairs


def _brute_dbscan(points, eps, min_pts):
    """Reference DBSCAN with min-label clusters and min-core-neighbor
    border assignment (the operator's deterministic contract)."""
    ids = [p[0] for p in points]
    xy = {p[0]: (p[1], p[2]) for p in points}

    def d2(a, b):
        ax, ay = xy[a]
        bx, by = xy[b]
        return (ax - bx) ** 2 + (ay - by) ** 2

    nbrs = {
        a: {b for b in ids if b != a and d2(a, b) <= eps * eps} for a in ids
    }
    core = {a for a in ids if len(nbrs[a]) + 1 >= min_pts}
    # components over core-core edges (brute closure)
    label = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for a in core:
            for b in nbrs[a] & core:
                m = min(label[a], label[b])
                if label[a] != m or label[b] != m:
                    label[a] = label[b] = m
                    changed = True
    out = {}
    for a in ids:
        if a in core:
            out[a] = (label[a], True)
        else:
            cn = [label[b] for b in nbrs[a] & core]
            out[a] = (min(cn) if cn else -1, False)
    return out


def test_dbscan_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    # two dense blobs + a bridge point + scattered noise, ids shuffled so
    # cluster minima are not spatially aligned
    pts = []
    for i in range(30):
        pts.append((i * 13 % 97, 10 + rng.random() * 3, 10 + rng.random() * 3))
    for i in range(30, 55):
        pts.append((i * 13 % 97, 40 + rng.random() * 3, 40 + rng.random() * 3))
    pts.append((95, 25.0, 25.0))  # isolated -> noise
    df = spark.createDataFrame(pts, "id long, x double, y double")
    eps, min_pts = 2.5, 4
    got = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in dbscan(df, eps, min_pts).collect()
    }
    exp = _brute_dbscan(pts, eps, min_pts)
    assert got == exp


def test_eps_pairs_complete_across_cell_boundaries(spark):
    """Points just inside eps but in adjacent cells must pair; points
    farther than eps in the same cell must not."""
    eps = 1.0
    pts = [
        (0, 0.99, 0.5),   # cell (0,0)
        (1, 1.01, 0.5),   # cell (1,0) — 0.02 apart, must pair
        (2, 5.05, 5.05),  # same cell as 3 but > eps away
        (3, 5.95, 5.95),
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    pairs = {
        (r["a"], r["b"]) for r in eps_neighbor_pairs(df, eps).collect()
    }
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (2, 3) not in pairs and (3, 2) not in pairs


def test_dbscan_negative_coordinates(spark):
    """floor-division cells must behave across the origin (negative
    coords hash to negative cells, not cell 0)."""
    pts = [(i, -3.0 + 0.1 * i, -3.0) for i in range(5)] + [(9, 50.0, 50.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"]: r["cluster"] for r in dbscan(df, 0.5, 3).collect()}
    assert got[9] == -1
    assert all(got[i] == 0 for i in range(5))


def test_dbscan_rejects_degenerate_min_pts(spark):
    """min_pts <= 1 is rejected up front (ADVICE r4): the pair-counting
    plan cannot see isolated points, which at that setting are core by
    definition — failing loudly beats silently labeling them noise."""
    import pytest

    from locus_spark.operators.density import dbscan

    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, 1.0, 1)
