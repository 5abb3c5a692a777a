"""Distributed exact top-fraction selection per group.

"Keep the best q% of documents per language" is the quality-filtering step
of a training-data pipeline.  The naive form — a window rank over
``partitionBy(lang)`` — funnels every group through ONE reducer: at 100 TB
the dominant language is most of the corpus, so that plan is a single-node
sort no matter how many executors exist.

This implements EXACT selection in two passes, both embarrassingly parallel:

1. histogram pass — bucket the (monotone) order value into ``buckets``
   integer bins and count rows per (group, bucket): a map-side-combinable
   groupBy whose output is at most ``groups × buckets`` rows (tiny).  A
   cumulative window over THAT table (per-group, ≤``buckets`` rows each)
   finds each group's threshold bucket and the residual quota inside it.
2. filter pass — rows strictly above the threshold bucket pass outright
   (pure filter); rows IN the threshold bucket are ranked within
   (group, bucket) — an expected ``n_group / buckets`` rows per partition,
   not ``n_group`` — and the top ``quota`` of them fill the remainder.

Ties: rows with equal order values always land in the same bucket, so the
boundary is only ever cut inside one bucket, where the deterministic
``(order desc, id asc)`` rank decides — byte-identical to the single-window
oracle semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    frac: float,
    id_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 4096,
) -> DataFrame:
    """Exactly the top ``ceil(frac * n_group)`` rows of each group by
    ``order_col`` (desc), ties broken by ascending ``id_col``.  ``[lo, hi)``
    must bound the order values (values at/above ``hi`` clamp into the top
    bucket; below ``lo`` into the bottom — correctness is unaffected, only
    the histogram's discriminating power).

    Returns the input rows (all columns) of the selected set.
    """
    return _top_k_per_group(
        df, group_col, order_col, id_col,
        k_of_total=lambda total: F.ceil(F.lit(frac) * total),
        lo=lo, hi=hi, buckets=buckets,
    )


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    id_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 4096,
) -> DataFrame:
    """Exactly the top ``min(n, n_group)`` rows of each group — the
    "keep at most N documents per host" cap of web-corpus curation.  Same
    two-pass histogram selection as :func:`top_fraction_per_group`: no
    per-group global sort, so a giant host never serializes through one
    reducer."""
    return _top_k_per_group(
        df, group_col, order_col, id_col,
        k_of_total=lambda total: F.least(F.lit(n).cast("long"), total),
        lo=lo, hi=hi, buckets=buckets,
    )


def top_alloc_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    alloc: DataFrame,
    id_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 4096,
) -> DataFrame:
    """Exactly the top ``min(alloc.n, n_group)`` rows of each group, with a
    DIFFERENT quota per group — ``alloc`` is a tiny (group, n) table (one
    row per group, broadcast onto the histogram).  Same two-pass histogram
    machinery as the fixed-``n`` variant; groups absent from ``alloc``
    keep nothing."""
    return _top_k_per_group(
        df, group_col, order_col, id_col,
        k_of_total=lambda total: F.least(F.col("_alloc_n"), total),
        lo=lo, hi=hi, buckets=buckets,
        alloc=alloc.select(group_col, F.col("n").cast("long").alias("_alloc_n")),
    )


def _top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    k_of_total,
    lo: float,
    hi: float,
    buckets: int,
    alloc: DataFrame | None = None,
) -> DataFrame:
    """Shared exact two-pass selection; ``k_of_total`` maps the per-group
    total-count Column to the per-group keep-count Column (and may read
    the ``_alloc_n`` column when ``alloc`` is supplied)."""
    bucket = F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(order_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(buckets)),
        ),
    ).cast("long")
    src = df.withColumn("_bkt", bucket)

    # pass 1: (group, bucket) histogram — the only full-data aggregation,
    # map-side combinable, output ≤ groups × buckets rows
    hist = src.groupBy(group_col, "_bkt").agg(F.count("*").alias("_cnt"))
    if alloc is not None:
        hist = hist.join(F.broadcast(alloc), group_col)
    wdesc = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    marked = hist.select(
        group_col,
        "_bkt",
        "_cnt",
        F.sum("_cnt").over(wdesc).alias("_cum"),       # rows at-or-above bucket
        k_of_total(F.sum("_cnt").over(wall)).alias("_k"),
    )
    # threshold bucket: highest bucket whose cumulative count reaches k
    thresholds = (
        marked.filter(F.col("_cum") >= F.col("_k"))
        .groupBy(group_col)
        .agg(
            F.max("_bkt").alias("_tbkt"),
            # quota inside the threshold bucket = k - rows strictly above it
            F.max_by(F.col("_k") - (F.col("_cum") - F.col("_cnt")), "_bkt").alias(
                "_quota"
            ),
        )
    )
    joined = src.join(F.broadcast(thresholds), group_col)

    above = joined.filter(F.col("_bkt") > F.col("_tbkt"))
    wbkt = Window.partitionBy(group_col, "_bkt").orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    boundary = (
        joined.filter(F.col("_bkt") == F.col("_tbkt"))
        .withColumn("_rn", F.row_number().over(wbkt))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn")
    )
    drop_cols = ["_bkt", "_tbkt", "_quota"]
    return above.unionByName(boundary).drop(*drop_cols)
