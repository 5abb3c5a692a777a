"""Cross-snapshot incremental dedup + repeated-span statistics.

Pins (a) keep/drop semantics against hand-computed expectations, (b) parity
between the broadcast and shuffle membership-probe plans, (c) the plan shape
the 100-TB contract requires — the corpus side streams through a broadcast
left-semi join, it is never sort-merge-joined — and (d) that within-document
span repetition does NOT count as duplication (the flag is distinct-doc
frequency >= 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from locus_spark.operators.dedup import incremental_exact_dedup, span_dup_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_keeps_only_unseen_content(spark):
    corpus = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    batch = _docs(
        spark,
        [
            (10, "alpha beta"),  # already in corpus -> dropped
            (11, "epsilon zeta"),  # new
            (13, "epsilon zeta"),  # within-batch dup of 11 -> folded into it
            (12, "eta theta"),  # new
        ],
    )
    out = {
        r["doc_id"]: r["n_batch_dups"]
        for r in incremental_exact_dedup(corpus, batch).collect()
    }
    assert out == {11: 2, 12: 1}


def test_incremental_broadcast_and_shuffle_probes_agree(spark):
    docs = [(i, f"text {i % 7}") for i in range(40)]
    corpus = _docs(spark, docs[:25])
    batch = _docs(spark, [(i + 100, t) for i, (_, t) in enumerate(docs[25:])])
    a = sorted(
        map(tuple, incremental_exact_dedup(corpus, batch, True).collect())
    )
    b = sorted(
        map(tuple, incremental_exact_dedup(corpus, batch, False).collect())
    )
    assert a == b


def test_incremental_corpus_side_is_broadcast_semi_join(spark):
    corpus = _docs(spark, [(1, "alpha beta")])
    batch = _docs(spark, [(10, "alpha beta"), (11, "new text")])
    plan = (
        incremental_exact_dedup(corpus, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the membership probe must stream the corpus against a broadcast batch
    # fingerprint set; a sort-merge join here would shuffle the corpus
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_dup_stats_cross_doc_only(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d"),  # spans: [a b c], [b c d]
            (2, "x b c d"),  # spans: [x b c], [b c d] -> shares [b c d] with 1
            (3, "q r s"),  # unique span
            (4, "m n o m n o m n o"),  # repeats ITSELF only -> no dup
            (5, "t u"),  # shorter than w -> absent from output
        ],
    )
    rows = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
        for r in span_dup_stats(docs, w=3).collect()
    }
    assert rows[1] == (2, 1, 0.5)
    assert rows[2] == (2, 1, 0.5)
    assert rows[3] == (1, 0, 0.0)
    # 7 windows, "m n o" x3 + "n o m" x2 + "o m n" x2, all single-document
    assert rows[4] == (7, 0, 0.0)
    assert 5 not in rows


def test_span_dup_stats_counts_every_position_of_a_shared_span(spark):
    # doc 1 contains the shared trigram TWICE -> both window positions count
    docs = _docs(
        spark,
        [(1, "p q r z p q r"), (2, "p q r")],
    )
    rows = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in span_dup_stats(docs, w=3).collect()
    }
    assert rows[1] == (5, 2)  # [p q r] at positions 1 and 5
    assert rows[2] == (1, 1)


def test_span_dup_stats_tokenization_drops_empty_tokens(spark):
    docs = _docs(spark, [(1, "a  b   c d"), (2, "a b c x")])
    rows = {r["doc_id"]: r["n_dup_spans"] for r in span_dup_stats(docs, w=3).collect()}
    # multi-space runs collapse to the same token stream as single spaces
    assert rows[1] == 1 and rows[2] == 1


def test_span_dup_stats_no_per_row_python(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    plan = (
        span_dup_stats(docs, w=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def _bands_for(spark, docs):
    from locus_spark.operators.dedup import _doc_shingles, band_signatures

    return band_signatures(_doc_shingles(docs))


def test_incremental_minhash_flags_exact_and_skips_disjoint(spark):
    from locus_spark.operators.dedup import incremental_minhash_dedup

    corpus = _docs(
        spark, [(1, "w1 w2 w3 w4 w5 w6"), (2, "z1 z2 z3 z4 z5 z6")]
    )
    batch = _docs(
        spark,
        [
            (10, "w1 w2 w3 w4 w5 w6"),  # exact dup of corpus 1 -> j = 1.0
            (11, "q1 q2 q3 q4 q5 q6"),  # disjoint shingles -> never flagged
            (12, "w1 w2 w3 w4 w5 w6"),  # batch-duplicate of 10 -> own row
            (13, "a b"),  # < shingle tokens -> no signature, never flagged
        ],
    )
    out = {
        r["doc_id"]: (r["match_id"], r["jaccard"])
        for r in incremental_minhash_dedup(
            _bands_for(spark, corpus), corpus, batch
        ).collect()
    }
    assert out == {10: (1, 1.0), 12: (1, 1.0)}


def test_incremental_minhash_dup_corpus_texts_collapse_to_min_rep(spark):
    from locus_spark.operators.dedup import incremental_minhash_dedup

    # two corpus docs with IDENTICAL text: the layout holds one
    # representative (min id), and the match reports it
    corpus = _docs(
        spark, [(7, "m1 m2 m3 m4 m5"), (3, "m1 m2 m3 m4 m5")]
    )
    batch = _docs(spark, [(20, "m1 m2 m3 m4 m5")])
    out = incremental_minhash_dedup(
        _bands_for(spark, corpus), corpus, batch
    ).collect()
    assert [(r["doc_id"], r["match_id"], r["jaccard"]) for r in out] == [
        (20, 3, 1.0)
    ]


def test_incremental_minhash_corpus_layout_never_sort_merge_joined(spark):
    from locus_spark.operators.dedup import incremental_minhash_dedup

    corpus = _docs(spark, [(1, "w1 w2 w3 w4")])
    batch = _docs(spark, [(10, "w1 w2 w3 w4"), (11, "u1 u2 u3 u4")])
    plan = (
        incremental_minhash_dedup(_bands_for(spark, corpus), corpus, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every corpus-sized frame (band layout, verify shingles) must stream
    # against broadcast batch-side builds — no corpus shuffle anywhere
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
