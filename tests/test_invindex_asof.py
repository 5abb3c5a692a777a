"""Inverted-index search (operators/invindex.py) and as-of join
(operators/asof.py): brute-force parity, bucket partition pruning, and the
tie/no-match edges of the forward-fill merge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from locus_spark.operators.asof import asof_join
from locus_spark.operators.invindex import (
    POSTING_BUCKETS,
    build_postings,
    prune_to_term_buckets,
    search_and,
    write_posting_layout,
)


def _docs(spark):
    rows = [
        (1, "red green blue"),
        (2, "red red green"),
        (3, "green blue"),
        (4, "red blue red green"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_search_and_matches_bruteforce(spark):
    docs = _docs(spark)
    out = search_and(build_postings(docs), ("red", "green"))
    got = {r["doc_id"]: r["sum_tf"] for r in out.collect()}
    # doc 1: 1+1, doc 2: 2+1, doc 4: 2+1; doc 3 lacks 'red'
    assert got == {1: 2, 2: 3, 4: 3}


def test_persisted_layout_prunes_to_term_buckets(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "postings")
    write_posting_layout(build_postings(docs), path)
    layout = spark.read.parquet(path)
    terms = ("red", "green")
    pruned = prune_to_term_buckets(spark, layout, terms)

    # answers identical to the from-scratch search
    a = {r["doc_id"]: r["sum_tf"] for r in search_and(pruned, terms).collect()}
    b = {
        r["doc_id"]: r["sum_tf"]
        for r in search_and(build_postings(docs), terms).collect()
    }
    assert a == b and a

    # the _pb filter must be a PLANNING-time partition filter, and the
    # pruned scan must touch at most |terms| of POSTING_BUCKETS directories
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_pb" in plan.split("PartitionFilters")[1][:200]
    n_dirs = sum(1 for p in (tmp_path / "postings").iterdir() if p.name.startswith("_pb="))
    assert n_dirs > len(terms)  # layout has more buckets than the query reads
    assert pruned.select("_pb").distinct().count() <= len(terms)
    assert POSTING_BUCKETS == 64


def test_bm25_matches_reference_formula(spark):
    import math

    docs = _docs(spark)
    from locus_spark.operators.invindex import (
        BM25_B,
        BM25_K1,
        build_scored_postings,
        corpus_stats,
        search_bm25,
    )

    n, avgdl = corpus_stats(docs)
    assert n == 5 and avgdl == (3 + 3 + 2 + 4 + 0) / 5.0
    terms = ("red", "blue")
    out = search_bm25(build_scored_postings(docs), terms, n, avgdl, k=4)
    got = [(r["doc_id"], r["bm25"]) for r in out.collect()]

    # python mirror of the Robertson BM25 formula
    texts = {1: "red green blue", 2: "red red green", 3: "green blue", 4: "red blue red green"}
    tfs = {d: {t: texts[d].split().count(t) for t in terms} for d in texts}
    dfreq = {t: sum(1 for d in tfs if tfs[d][t] > 0) for t in terms}

    def score(d):
        dl = len(texts[d].split())
        s = 0.0
        for t in terms:
            tf = tfs[d][t]
            if tf == 0:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        return round(s, 6)

    want = sorted(
        ((d, score(d)) for d in texts if score(d) > 0),
        key=lambda x: (-x[1], x[0]),
    )[:4]
    assert [(d, round(s, 6)) for d, s in got] == [
        (d, round(s, 6)) for d, s in want
    ]
    # ranking sanity: doc 4 (two 'red' + 'blue') outranks doc 3 (just 'blue')
    ranked = [d for d, _ in got]
    assert ranked.index(4) < ranked.index(3)


def test_phrase_search_matches_bruteforce(spark):
    from locus_spark.operators.invindex import (
        build_positional_postings,
        search_phrase,
    )

    rows = [
        (1, "a b c a b"),       # "a b": starts 1 and 4 -> 2 occurrences
        (2, "b a b a"),         # "a b": start 2 -> 1
        (3, "a a b"),           # "a b": start 2 -> 1
        (4, "b b a"),           # none
        (5, ""),
        (6, "a b a b a"),       # "a b a": starts 1 and 3 -> 2 (overlapping)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_positional_postings(docs)

    def brute(phrase):
        want = {}
        for d, t in rows:
            ts = [x for x in t.split(" ") if x]
            n = sum(
                1
                for s in range(len(ts) - len(phrase) + 1)
                if ts[s : s + len(phrase)] == list(phrase)
            )
            if n:
                want[d] = n
        return want

    for phrase in [("a", "b"), ("a", "b", "a"), ("b", "b"), ("c",), ("a", "a", "b")]:
        got = {
            r["doc_id"]: r["n_occ"]
            for r in search_phrase(postings, phrase).collect()
        }
        assert got == brute(phrase), phrase


def test_phrase_search_is_one_agg_no_self_join(spark):
    from locus_spark.operators.invindex import (
        build_positional_postings,
        search_phrase,
    )

    docs = spark.createDataFrame(
        [(1, "x y z x y")], "doc_id long, text string"
    )
    out = search_phrase(build_positional_postings(docs), ("x", "y", "z"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # slot-offset aggregation, never an m-way join


def test_bm25_topk_plan_is_take_ordered_not_window(spark):
    docs = _docs(spark)
    from locus_spark.operators.invindex import (
        build_scored_postings,
        corpus_stats,
        search_bm25,
    )

    n, avgdl = corpus_stats(docs)
    out = search_bm25(build_scored_postings(docs), ("red", "green"), n, avgdl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no window
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # |terms|-row df side broadcast


def _ts(m):
    return dt.datetime(2026, 1, 1, 12, m)


def test_asof_join_latest_at_or_before_with_ties(spark):
    left = spark.createDataFrame(
        [(100, 7, _ts(10)), (101, 7, _ts(3)), (102, 8, _ts(5)), (103, 9, _ts(1))],
        "lid long, k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 7, _ts(2)),
            (2, 7, _ts(10)),   # equal to left ts -> inclusive match
            (3, 7, _ts(10)),   # tie on ts -> highest tiebreak (rid 3) wins
            (4, 8, _ts(6)),    # after the only left row of key 8 -> no match
        ],
        "rid long, k long, rt timestamp",
    )
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt",
        payload_cols=("rid", "rt"), tiebreak="rid",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # lid 100: ties at 12:10 -> rid 3; lid 101: only 12:02 before it -> rid 1
    # lid 102: right row is after -> dropped; lid 103: key 9 has no rights
    assert got == {100: 3, 101: 1}


def test_asof_join_is_single_pass_no_pair_join(spark):
    left = spark.range(0, 50).select(
        F.col("id").alias("lid"),
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("lt"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("rid"),
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 45 + 1_700_000_000).alias("rt"),
    )
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt",
        payload_cols=("rid",), tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join operator

    # parity vs the quadratic pair-join formulation
    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k")) & (F.col("r.rt") <= F.col("l.lt")))
        .groupBy("l.lid")
        .agg(F.max(F.struct("r.rt", "r.rid")).alias("m"))
        .select("lid", F.col("m.rid").alias("rid"))
    )
    assert {(r["lid"], r["rid"]) for r in out.collect()} == {
        (r["lid"], r["rid"]) for r in naive.collect()
    }
