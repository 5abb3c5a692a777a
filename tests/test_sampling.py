"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from locus_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    threshold,
)


def test_rate_is_approximately_honored(spark):
    df = spark.range(20_000).select(F.col("id").alias("k"))
    n = hash_sample(df, 0.3, "k").count()
    assert abs(n / 20_000 - 0.3) < 0.02


def test_lower_rate_is_subset_of_higher(spark):
    """Monotone thresholds: downscaling a mix keeps a subset, not a reshuffle."""
    df = spark.range(5_000).select(F.col("id").alias("k"))
    small = {r.k for r in hash_sample(df, 0.2, "k").collect()}
    big = {r.k for r in hash_sample(df, 0.5, "k").collect()}
    assert small <= big


def test_partitioning_invariance(spark):
    """The keep set is a pure function of (key, seed) — repartitioning the
    input must not change it (df.sample() fails this)."""
    df = spark.range(3_000).select(F.col("id").alias("k"))
    a = {r.k for r in hash_sample(df, 0.4, "k").collect()}
    b = {r.k for r in hash_sample(df.repartition(17), 0.4, "k").collect()}
    assert a == b


def test_stratified_rates_and_default(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(9_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_sample(
        df, "lang", {"en": 0.5, "de": 1.0}, key_col="k", default_rate=0.0
    )
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("de") == 3_000  # rate 1.0 keeps everything
    assert "zh" not in by_lang  # default 0.0 drops the stratum
    assert abs(by_lang["en"] / 3_000 - 0.5) < 0.04


def test_threshold_edges():
    assert threshold(0.0) == 0
    assert threshold(1.0) == 1 << 32
    assert threshold(-3.0) == 0
    assert threshold(2.0) == 1 << 32


def test_sampling_plan_has_no_shuffle(spark):
    """The keep rule is a pure filter — the physical plan must contain no
    Exchange (at 100 TB a sampling pass that shuffles is a non-starter)."""
    import contextlib
    import io

    df = spark.range(1_000).select(F.col("id").alias("k"))
    out = stratified_sample(
        df.withColumn("lang", F.lit("en")), "lang", {"en": 0.5}, key_col="k"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no Python UDF in the hot path
