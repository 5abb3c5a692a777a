"""Two-pass histogram top-fraction selection (operators/selection.py)."""

from __future__ import annotations

import math
import random

from locus_spark.operators.selection import top_fraction_per_group, top_n_per_group


def _truth(rows, frac):
    """Driver-side oracle: top ceil(frac*n) per group by (v desc, id asc)."""
    by_group: dict[str, list[tuple]] = {}
    for rid, grp, v in rows:
        by_group.setdefault(grp, []).append((rid, v))
    keep = set()
    for grp, members in by_group.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        k = math.ceil(frac * len(members))
        keep |= {rid for rid, _ in members[:k]}
    return keep


def test_matches_window_semantics_random(spark):
    rng = random.Random(11)
    rows = [
        (i, ["en", "de", "zh"][i % 3], round(rng.random(), 6)) for i in range(3_000)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.id
        for r in top_fraction_per_group(
            df, "grp", "v", 0.25, "id", buckets=64
        ).collect()
    }
    assert got == _truth(rows, 0.25)


def test_tie_heavy_boundary(spark):
    """Many equal order values around the cut: the deterministic id rank must
    decide, and coarse buckets (everything in ~2 bins) must stay exact."""
    rows = [(i, "g", 0.5) for i in range(40)] + [(100 + i, "g", 0.9) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = sorted(
        r.id
        for r in top_fraction_per_group(df, "grp", "v", 0.4, "id", buckets=4).collect()
    )
    # k = ceil(0.4*50) = 20: the ten 0.9s, then the ten smallest-id 0.5s
    assert got == sorted(list(range(100, 110)) + list(range(10)))


def test_frac_one_keeps_everything(spark):
    rows = [(i, "a" if i % 2 else "b", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = top_fraction_per_group(df, "grp", "v", 1.0, "id", lo=0.0, hi=50.0)
    assert out.count() == 50


def test_no_global_per_group_sort_in_plan(spark):
    """The design claim: selection never globally sorts a group.  The only
    Sort allowed in the physical plan is the boundary-bucket window's
    per-(group, bucket) local sort — every Sort node must be non-global and
    keyed on (group, _bkt), never on the group alone (which would funnel a
    100-TB dominant group through one reducer)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100_000)) / 1e5).alias("v"),
    )
    out = top_fraction_per_group(df, "grp", "v", 0.25, "id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "Sort " in line and "Sort [" in line:
            assert "global=false" in line, f"global sort in plan: {line}"
    # no row-at-a-time Python in the hot path
    assert "BatchEvalPython" not in plan


def test_top_n_matches_window_semantics(spark):
    """Per-group fixed cap: top min(n, size) by (v desc, id asc), including
    a tie-heavy group and a group smaller than the cap."""
    rng = random.Random(23)
    rows = (
        [(i, "big", round(rng.random(), 6)) for i in range(500)]
        + [(1000 + i, "tied", 0.5) for i in range(30)]
        + [(2000 + i, "small", float(i)) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.id for r in top_n_per_group(df, "grp", "v", 10, "id", buckets=32).collect()
    }
    want = set()
    by_group: dict[str, list[tuple]] = {}
    for rid, grp, v in rows:
        by_group.setdefault(grp, []).append((rid, v))
    for grp, members in by_group.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        want |= {rid for rid, _ in members[:10]}
    assert got == want
    assert len([i for i in got if 2000 <= i < 2010]) == 3  # small group intact


def test_out_of_range_values_clamp(spark):
    """Values at/above hi or below lo clamp into edge buckets without loss."""
    rows = [(1, "g", -5.0), (2, "g", 0.5), (3, "g", 99.0), (4, "g", 1.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {r.id for r in top_fraction_per_group(df, "grp", "v", 0.5, "id").collect()}
    assert got == {3, 4}  # top ceil(0.5*4)=2 by value
