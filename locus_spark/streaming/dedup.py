"""At-least-once ingestion dedup: batch + streaming twins.

A web-scale training pipeline ingests from replayed/at-least-once transports
(crawler retries, queue redelivery), so the FIRST stage after the source is
key-dedup.  The reference engine is purely batch/in-memory
(/root/reference/locus/kd.py:29-55 builds from a complete sequence), so this
is a north-rule pipeline addition, not a parity item.

* ``dedup_events_batch`` — ``dropDuplicates([key])`` over the bounded table.
  Redeliveries are exact row copies, so which copy survives is
  value-irrelevant and the result is deterministic (oracle:
  ``SELECT DISTINCT *``).
* ``dedup_events_stream`` — ``dropDuplicatesWithinWatermark``: state keeps
  one entry per key only until the event-time watermark passes it, so state
  size is bounded by the redelivery horizon × ingest rate — NOT by total
  stream history (a plain streaming ``dropDuplicates`` would grow state
  forever, which is the 100 TB failure mode).  A redelivery inside the
  watermark window is dropped even if it lands in a later micro-batch; a
  redelivery older than the watermark may pass through (disclosed
  semantics — pick the watermark ≥ the transport's max redelivery lag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def dedup_events_batch(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Exactly-once view of an at-least-once bounded ingest."""
    return events.dropDuplicates([key])


def dedup_events_stream(
    spark: SparkSession,
    events_path: str,
    schema: str = EVENT_SCHEMA,
    watermark: str = "2 hours",
    key: str = "event_id",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin: watermark-bounded key dedup over a file stream.

    Test status: verified by batch equivalence on a finite replayed input
    AND a multi-batch redelivery replay
    (tests/test_streaming_multimodal.py::test_dedup_stream_drops_redelivery:
    one file per micro-batch; a redelivered key in a later batch inside the
    watermark is dropped, a fresh key passes).  No live unbounded-source run
    is possible in this sandbox.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )
