"""Event attribution: batch + streaming stream-stream join twins.

A web-scale ingest pipeline attributes conversions to the exposure that
preceded them (view→click here): an equi-join on the user plus an
event-time interval bound.  The reference engine is batch/in-memory
(/root/reference/locus/kd.py:29-55), so this is a north-rule pipeline
addition completing the Structured-Streaming surface (windowed agg,
watermarked dedup, stateful sessionization, and now a watermarked
stream-stream join).

* ``attribute_clicks_batch`` — plain interval join over the bounded table:
  one shuffle keyed on ``user_id`` with the interval bound applied inside
  the join; per-user candidate volume is (views × clicks) within the gap,
  bounded by per-user activity rate, not stream length.  A pathologically
  hot user would need the same salting treatment as hot cells
  (locus_spark/skew.py) — disclosed, not special-cased here.
* ``attribute_clicks_stream`` — the streaming twin.  BOTH sides carry an
  event-time watermark and the join condition carries the interval bound;
  together they let Spark expire join state (a stream-stream join without
  the time bound keeps every row forever — the 100 TB failure mode).  A
  view older than ``watermark + gap`` is evicted from state, so a click
  can only be attributed to views inside that horizon.  Eviction is
  batch-granular: Spark joins a micro-batch's input against EXISTING
  state before evicting, and the watermark itself lags a batch, so a
  late row can still match in the batch right after the watermark
  passed it — the guarantee is bounded state and no-match-after-evict,
  not a same-batch drop (pinned by the multi-batch replay pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locus_spark.streaming.dedup import EVENT_SCHEMA


def _views(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )


def _clicks(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )


def _joined(views: DataFrame, clicks: DataFrame, gap_s: int) -> DataFrame:
    cond = (
        (views["user_id"] == clicks["click_user"])
        & (clicks["click_ts"] >= views["view_ts"])
        & (clicks["click_ts"] <= views["view_ts"] + F.expr(f"INTERVAL {gap_s} SECONDS"))
    )
    return views.join(clicks, cond, "inner").select(
        "user_id", "view_id", "click_id", "view_ts", "click_ts"
    )


def attribute_clicks_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Every (view, click) pair of the same user with the click inside
    ``gap_s`` seconds after the view (inclusive both ends)."""
    return _joined(_views(events), _clicks(events), gap_s)


def attribute_clicks_stream(
    spark: SparkSession,
    views_path: str,
    clicks_path: str,
    schema: str = EVENT_SCHEMA,
    gap_s: int = 1800,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin over two file streams (one file per micro-batch in
    tests).  State on each side is expired once the other side's watermark
    passes the interval bound — bounded by ``watermark + gap``, never by
    stream history.

    Test status: verified by batch equivalence on a finite replayed input
    and a multi-batch replay where a click late beyond the watermark is
    dropped (tests/test_streaming_joins.py).  No live unbounded-source run
    is possible in this sandbox."""
    def reader():
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r

    views = (
        reader().parquet(views_path).transform(_views)
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        reader().parquet(clicks_path).transform(_clicks)
        .withWatermark("click_ts", watermark)
    )
    return _joined(views, clicks, gap_s)
