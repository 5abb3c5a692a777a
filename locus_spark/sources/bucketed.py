"""Bucketed-table sink + co-located joins — the write-once shuffle
eliminator for repeated big-table equi-joins.

Spark's file-source bucketing pre-shuffles a table ONCE at write time:
``bucketBy(n, keys)`` hashes every row into one of ``n`` bucket files, and
a join of two tables bucketed on the join keys with the SAME bucket count
plans with NO Exchange on either side — each task reads bucket *i* of both
tables and joins locally.  At 100 TB that is the difference between
re-shuffling the corpus for every join in a curation pipeline and paying
one layout write up front (the same build-once/query-many contract the
spatial layouts in ``locus_spark.queries`` follow — reference
/root/reference/locus/kd.py:29-55 builds its tree once for many queries).

Contract notes (all enforced or surfaced here, not left to hope):

- bucketing only applies through ``saveAsTable`` (a path-only
  ``parquet(path)`` write silently drops the bucket spec), so the sink
  takes a table name and registers an EXTERNAL table at ``path``;
- both sides must agree on bucket count AND the join must cover every
  bucket column — ``colocated_join`` reads the actual spec back from the
  catalog and raises with the two specs when they cannot co-locate;
- ``sortBy`` within buckets additionally lets the sort-merge join skip
  its per-bucket Sort when each bucket holds one file (we coalesce to one
  write task per bucket group for exactly that reason at layout sizes
  where it is affordable; at 100 TB you keep multiple writer tasks and
  accept the cheap local re-sort instead — no Exchange either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as an external parquet table bucketed on
    ``bucket_cols`` and return the re-read table (never the input plan)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return spark.table(name)


def bucket_spec(spark: SparkSession, name: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_columns) as the catalog actually recorded them."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
    info = {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}
    n = int(info.get("Num Buckets", "0") or 0)
    cols_raw = info.get("Bucket Columns", "")
    cols = [c.strip(" `") for c in cols_raw.strip("[]").split(",") if c.strip(" `")]
    return n, cols


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables, refusing to run if their bucket specs
    cannot co-locate (mismatched counts or a join that does not cover the
    bucket columns would silently fall back to a full shuffle of both
    sides — at scale that is the failure mode this sink exists to prevent,
    so it is an error here, not a slow success).

    ``on`` is a list of join keys: a plain string joins same-named columns,
    a ``(left_col, right_col)`` pair joins differently-named ones."""
    ln, lcols = bucket_spec(spark, left_name)
    rn, rcols = bucket_spec(spark, right_name)
    if ln == 0 or rn == 0 or ln != rn:
        raise ValueError(
            f"cannot co-locate: {left_name} has {ln} buckets on {lcols}, "
            f"{right_name} has {rn} on {rcols} — rewrite one side with "
            f"write_bucketed(..., num_buckets={max(ln, rn)})"
        )
    pairs = [(c, c) if isinstance(c, str) else (c[0], c[1]) for c in on]
    if not (set(lcols) <= {a for a, _ in pairs} and set(rcols) <= {b for _, b in pairs}):
        raise ValueError(
            f"join keys {pairs} do not cover the bucket columns "
            f"({left_name}: {lcols}, {right_name}: {rcols}) — the scan "
            "output partitioning would not satisfy the join and both sides "
            "would re-shuffle"
        )
    left, right = spark.table(left_name), spark.table(right_name)
    cond = None
    for a, b in pairs:
        expr = left[a] == right[b]
        cond = expr if cond is None else cond & expr
    return left.join(right, on=cond, how=how)
