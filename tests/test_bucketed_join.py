"""Bucketed co-located join: plan shape (no Exchange), value equality with
the shuffled join, and the co-location guardrails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from locus_spark.sources.bucketed import bucket_spec, colocated_join, write_bucketed


def _mk_tables(spark, tmp_path, n_buckets_right=8):
    left = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("lang"),
        (F.col("id") * 3).alias("n_chars"),
    )
    right = spark.range(0, 400).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 5).alias("label"),
    )
    lt = write_bucketed(
        left, "t_bjoin_left", str(tmp_path / "left"),
        bucket_cols=["doc_id"], num_buckets=8, sort_cols=["doc_id"],
    )
    rt = write_bucketed(
        right, "t_bjoin_right", str(tmp_path / "right"),
        bucket_cols=["vec_id"], num_buckets=n_buckets_right, sort_cols=["vec_id"],
    )
    return lt, rt


def test_colocated_join_no_exchange_and_values(spark, tmp_path):
    _mk_tables(spark, tmp_path)
    assert bucket_spec(spark, "t_bjoin_left") == (8, ["doc_id"])

    # at test size Catalyst correctly prefers a broadcast join (the scans
    # even say "Bucketed: false (disabled by query planner)"); disable
    # broadcast to force the shape the layout exists for at 100 TB — a
    # sort-merge join whose both sides are bucket-aligned scans
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "t_bjoin_left", "t_bjoin_right", on=[("doc_id", "vec_id")]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: both scans are bucket-aligned, so the equi-join
        # runs with ZERO shuffles — a regression here re-shuffles the corpus
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    got = sorted(
        (r.doc_id, r.lang, r.n_chars, r.label)
        for r in joined.select("doc_id", "lang", "n_chars", "label").collect()
    )
    want = sorted((i, i % 7, i * 3, i % 5) for i in range(400))
    assert got == want


def test_colocated_join_rejects_mismatched_buckets(spark, tmp_path):
    _mk_tables(spark, tmp_path, n_buckets_right=4)
    with pytest.raises(ValueError, match="cannot co-locate"):
        colocated_join(spark, "t_bjoin_left", "t_bjoin_right",
                       on=[("doc_id", "vec_id")])


def test_colocated_join_rejects_uncovered_bucket_cols(spark, tmp_path):
    _mk_tables(spark, tmp_path)
    with pytest.raises(ValueError, match="do not cover"):
        colocated_join(spark, "t_bjoin_left", "t_bjoin_right",
                       on=[("lang", "label")])
