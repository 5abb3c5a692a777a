"""Generic as-of join: each left row matched to the LATEST right row with
the same key and ``right_ts <= left_ts`` (inclusive), ties on equal
``right_ts`` broken by the highest tiebreak column — fully deterministic.

Scale shape: the classic union-tag merge, NOT a pair join.  Right rows
carry their payload, left rows carry null; one window per key ordered by
(ts, side, tiebreak) forward-fills the most recent right payload onto
every left row.  Cost is one shuffle+sort of |left| + |right| rows keyed
on the join key — no (left x right) candidate blowup, which is what the
naive ``ON r.ts <= l.ts`` join does (quadratic per key).  Skewed keys
split like any sort: the window is per key but its input is the merged
stream, never a cross product.

(Composition note: Spark has no native ASOF JOIN; DuckDB does, which the
oracle uses as an independent formulation of the same semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    tiebreak: str,
) -> DataFrame:
    """Inner as-of join. Returns every ``left`` column plus
    ``payload_cols`` from the matched right row; left rows with no
    right row at-or-before them are dropped.

    ``tiebreak`` must be a right-side column unique within
    (key, right_ts) — the match is the max (right_ts, tiebreak) pair."""
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    l_cols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *l_cols,
    )
    # right rows sort before left rows at equal ts (inclusive match) and
    # among equal right ts the highest tiebreak is filled LAST — max wins.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_p._tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l, allowMissingColumns=True).withColumn(
        "_match", F.last("_p", ignorenulls=True).over(w)
    )
    out = merged.filter((F.col("_side") == 1) & F.col("_match").isNotNull())
    return out.select(
        *l_cols,
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )


__all__ = ["asof_join"]
