"""JSONL (newline-delimited JSON) ingestion for the documents table:
explicit schema, PERMISSIVE corrupt-record capture, and exact parity with
the parquet source.

Why this exists: crawl-scale text pipelines ingest JSONL long before
anything is columnar, and the two ingestion mistakes that matter at that
scale are (a) schema inference — a second full pass over 100 TB just to
guess types, and (b) silently dropping malformed lines.  This source
always passes an EXPLICIT schema (single pass, no inference job) and
reads in PERMISSIVE mode with a ``_corrupt_record`` column, so malformed
lines become countable rows instead of silent holes; ``split_corrupt``
separates them from the clean frame.

JSON source facts this module encodes (and tests pin):
- a corrupt line yields a row with every data column null and the raw
  line in the corrupt column — valid columns of OTHER rows are unaffected;
- Spark requires the corrupt column to be declared IN the schema;
- counting corrupt rows requires referencing only corrupt-column+cache or
  a separate action — Spark refuses ``filter(corrupt.isNotNull)`` on the
  raw frame (internal-row pushdown limitation), so ``split_corrupt``
  materializes the tagged frame first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: explicit ingestion schema of the documents JSONL feed (mirrors the
#: parquet documents table) + the corrupt-record capture column.
CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE JSONL read with the explicit schema — malformed lines
    surface as rows with ``_corrupt_record`` set, never as silent drops."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) frames.  The input is cached before filtering on
    the corrupt column (Spark disallows that filter on the un-materialized
    JSON scan); callers should unpersist ``raw`` when done."""
    raw = raw.cache()
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def documents_parquet_to_jsonl(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Materialize the JSONL twin of a testdata documents table (the
    fixture for ingestion tests/queries — deterministic content; Spark's
    JSON writer escapes embedded newlines/quotes per RFC 8259)."""
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1)
        .write.mode("overwrite")
        .json(out_path)
    )


__all__ = [
    "CORRUPT_COL",
    "DOCUMENTS_JSONL_SCHEMA",
    "read_documents_jsonl",
    "split_corrupt",
    "documents_parquet_to_jsonl",
]
