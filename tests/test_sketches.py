"""Sketch aggregations (operators/sketches.py): HLL in-bound check,
GK rank-interval check, and the heavy-hitter candidate superset guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from locus_spark.operators.sketches import (
    heavy_hitters,
    hll_distinct_check,
    quantile_sketch_check,
)


def test_hll_check_exact_and_in_bound(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        # ~1250 rows/group, ~400 distinct values each
        (F.col("id") % 1600).cast("string").alias("v"),
    )
    out = hll_distinct_check(df, "g", "v").collect()
    assert len(out) == 4
    exact = {r["g"]: r["exact_distinct"] for r in out}
    assert all(r["hll_ok"] for r in out), out
    assert exact == {"0": 400, "1": 400, "2": 400, "3": 400}


def test_quantile_rank_interval_with_heavy_duplicates(spark):
    # one value covers ranks 401..1600 of 2000 — p=0.5 and p=0.75 both land
    # inside a single repeated value's rank interval; the upper-rank-only
    # check (the bug the interval test replaced) would flag p=0.5 here.
    df = spark.createDataFrame(
        [("a", 1)] * 400 + [("a", 7)] * 1200 + [("a", 9)] * 400,
        "g string, v int",
    )
    out = quantile_sketch_check(df, "g", "v", (0.25, 0.5, 0.75, 0.99))
    rows = {r["p"]: r for r in out.collect()}
    assert all(r["rank_ok"] for r in rows.values()), rows
    assert rows[0.5]["exact_q"] == 7
    assert rows[0.99]["exact_q"] == 9


def test_heavy_hitters_exact_vs_bruteforce_with_thin_spread(spark):
    # worst case for per-batch pruning: the heavy token appears exactly once
    # per document, diluted by unique noise tokens, spread over many
    # partitions — it must still survive the candidate stage (pigeonhole)
    # and the final counts must equal the brute-force groupBy answer.
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("hot"),
            *[
                F.concat(F.lit(f"u{i}_"), F.col("id").cast("string"))
                for i in range(6)
            ],
        ).alias("text"),
    ).repartition(8)
    out = heavy_hitters(docs, support=0.05)
    got = {r["tok"]: r["cnt"] for r in out.collect()}

    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    total = toks.count()
    brute = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
        if r["cnt"] >= -(-5 * total // 100)  # ceil(0.05 * total)
    }
    assert got == brute
    assert got == {"hot": 400}  # 400 of 2800 tokens = 14.3% >= 5%
