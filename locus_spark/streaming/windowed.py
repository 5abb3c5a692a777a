"""Windowed streaming aggregation with late-data watermark."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_stream(
    spark: SparkSession,
    events_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming hourly event counts (tumbling window + watermark).

    Batch-equivalent of ``locus_spark.queries.q_events_hourly`` — the window
    struct is flattened to its start so results align with the batch
    ``date_trunc('hour', ts)`` form.  ``approx_count_distinct`` stands in for
    the exact distinct (exact distinct isn't incrementally computable in a
    streaming agg without full state).

    Test status: verified by BATCH EQUIVALENCE on a finite replayed input
    AND by an out-of-order multi-batch replay
    (tests/test_streaming_multimodal.py::test_windowed_stream_drops_too_late_events:
    ``max_files_per_trigger=1`` forces one file per micro-batch, pinning
    that a late event inside the watermark updates its window while an
    event older than the watermark is dropped).  No live unbounded-source
    run is possible in this sandbox.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "n_users_approx")
    )


def trending_props_stream(
    spark: SparkSession,
    events_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (hour, prop-value) counts from the JSON ``props`` column —
    the incremental half of ``queries.q_events_trending_props``.

    A top-N RANK is not incrementally emittable: a window's ranking can
    change on every late arrival until the watermark closes it, so the
    streaming stage maintains only the additive (window, k) counts (bounded
    state: watermark expires windows) and the exact top-3 is applied at
    serve time over the sink with the same two-pass histogram selection the
    batch query uses — rank-at-read over finalized counts, the standard
    streaming-TopN split.  Batch equivalence + late-data replay pinned in
    tests/test_streaming_multimodal.py::test_trending_stream_matches_batch_topn.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "k", "cnt")
    )
