"""Inverted text index: posting build, conjunctive (AND) search, and a
persisted token-bucketed layout with directory-level pruning.

The relational posting form is (tok, doc_id, tf) ROWS, not per-token
arrays: stopword posting lists at corpus scale are billions of entries,
and rows keep them partitionable/skew-splittable where a
``collect_list`` array would funnel each token through one task.

Search is pure relational: filter postings to the query terms (predicate
pushdown — on the persisted layout this prunes to |terms| hash-bucket
directories before any I/O), then ONE map-side-combined aggregation on
doc_id checks the AND condition (``count(distinct tok) == |terms|``).
The shuffle carries only postings of the query terms, never the corpus.

Reference scope note: the locus reference (/root/reference/locus) has no
text surface; this is training-data-pipeline/webtext functionality the
build mandate adds beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: number of token-hash partitions of the persisted posting layout —
#: a term query reads |terms| directories regardless of corpus size.
POSTING_BUCKETS = 64


def build_postings(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, doc_id, tf) posting rows — explode + one hash aggregation
    (map-side combine collapses within-partition repeats before shuffle)."""
    toks = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(text_col, " "), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    return toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))


def search_and(postings: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Documents containing ALL ``terms``: (doc_id, sum_tf).

    ``tok IN terms`` is a pushable predicate (reaches the parquet scan of
    a persisted layout; on the bucketed layout the `_pb` filter added by
    ``search_persisted`` prunes directories).  The grouped AND check is
    one aggregation over query-term postings only."""
    hits = postings.filter(F.col("tok").isin(list(terms)))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("tok")).alias("_nt"),
            F.sum("tf").alias("sum_tf"),
        )
        .filter(F.col("_nt") == len(terms))
        .select("doc_id", "sum_tf")
    )


def _bucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(POSTING_BUCKETS)).cast("int")


def write_posting_layout(postings: DataFrame, path: str) -> None:
    """Persist postings partitioned by token hash bucket ``_pb`` — the
    build-once sink of the index; queries prune to |terms| directories."""
    (
        postings.withColumn("_pb", _bucket(F.col("tok")))
        .repartition("_pb")
        .write.mode("overwrite")
        .partitionBy("_pb")
        .parquet(path)
    )


def prune_to_term_buckets(
    spark: SparkSession, layout: DataFrame, terms: tuple[str, ...]
) -> DataFrame:
    """Partition-prune a persisted posting layout (parquet partitioned by
    ``_pb``) to the query terms' bucket directories: the `_pb IN` filter
    is directory-level pruning and `tok IN` (added by ``search_and``) a
    pushed row-group predicate inside them — a term query reads |terms|
    of POSTING_BUCKETS directories regardless of corpus size."""
    # bucket ids are a pure hash of the LITERAL terms — computed via a
    # 1-row Spark expression so Spark's xxhash64 (not a Python mirror)
    # decides them; bounded driver work, same contract as the IVF
    # n_probe cluster-id collect (queries._persisted_ivf_layout).
    buckets = {
        int(v)
        for v in spark.range(1)
        .select(*[_bucket(F.lit(t)).alias(f"b{i}") for i, t in enumerate(terms)])
        .first()
    }
    return layout.filter(F.col("_pb").isin(sorted(buckets)))


def search_persisted(
    spark: SparkSession, layout: DataFrame, terms: tuple[str, ...]
) -> DataFrame:
    """Conjunctive search over the persisted bucket-partitioned layout."""
    return search_and(prune_to_term_buckets(spark, layout, terms), terms)


__all__ = [
    "POSTING_BUCKETS",
    "build_postings",
    "search_and",
    "write_posting_layout",
    "prune_to_term_buckets",
    "search_persisted",
]
