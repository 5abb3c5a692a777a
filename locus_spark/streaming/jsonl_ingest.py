"""Streaming JSONL ingestion: the file-arrival twin of
``sources/jsonl.read_documents_jsonl``.

A crawl feed lands as JSONL files in a directory; Structured Streaming's
file source turns each arrival into a micro-batch.  Same contract as the
batch reader: EXPLICIT schema (the file source requires one — no
inference over an unbounded directory) and PERMISSIVE corrupt capture, so
a malformed line in any arriving file becomes a counted row in the
corrupt sink, never a silent drop or a stream-killing exception.

The corrupt split happens per micro-batch inside ``foreachBatch`` —
the corrupt-column filter needs a materialized frame (same Spark
limitation as the batch path), and foreachBatch is where a stream gets
one.  Both sinks are idempotent parquet appends keyed by batch id via
the checkpoint, so at-least-once replay stays exactly-once downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locus_spark.sources.jsonl import CORRUPT_COL, DOCUMENTS_JSONL_SCHEMA


def stream_documents_jsonl(spark: SparkSession, src_dir: str) -> DataFrame:
    """Unbounded JSONL read over an arrival directory (one file per
    micro-batch at most ``maxFilesPerTrigger``)."""
    return (
        spark.readStream.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )


def run_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    clean_path: str,
    corrupt_path: str,
    checkpoint: str,
) -> None:
    """Drain everything currently in ``src_dir`` (availableNow trigger),
    splitting each micro-batch into the clean and corrupt parquet sinks."""

    def _split(batch: DataFrame, _bid: int) -> None:
        batch = batch.cache()
        (
            batch.filter(F.col(CORRUPT_COL).isNull())
            .drop(CORRUPT_COL)
            .write.mode("append")
            .parquet(clean_path)
        )
        (
            batch.filter(F.col(CORRUPT_COL).isNotNull())
            .select(CORRUPT_COL)
            .write.mode("append")
            .parquet(corrupt_path)
        )
        batch.unpersist()

    (
        stream_documents_jsonl(spark, src_dir)
        .writeStream.foreachBatch(_split)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


__all__ = ["stream_documents_jsonl", "run_ingest_available_now"]
