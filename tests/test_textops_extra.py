"""Decontamination, repetition stats, and exact length quantiles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from locus_spark.operators.decontam import contaminated_ids, decontaminate
from locus_spark.operators.textops import len_quantiles, repetition_stats


@pytest.fixture(scope="module")
def train(spark):
    rows = [
        # 0: verbatim copy of eval doc 100 -> contaminated
        (0, "alpha beta gamma delta epsilon zeta", "en"),
        # 1: shares the 4-gram "beta gamma delta epsilon" -> contaminated
        (1, "prefix beta gamma delta epsilon suffix", "en"),
        # 2: same words, different order -> no shared 4-gram -> clean
        (2, "zeta epsilon delta gamma beta alpha", "en"),
        # 3: disjoint vocabulary -> clean
        (3, "one two three four five six seven", "en"),
        # 4: too short for any 4-gram -> always clean
        (4, "alpha beta gamma", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )


def test_contaminated_ids(train, eval_docs):
    bad = sorted(r.doc_id for r in contaminated_ids(train, eval_docs).collect())
    assert bad == [0, 1]


def test_decontaminate_keeps_clean_docs(train, eval_docs):
    kept = sorted(r.doc_id for r in decontaminate(train, eval_docs).collect())
    assert kept == [2, 3, 4]


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # bigrams: "a b", "b a", "a b" -> 3 total, 2 uniq, top=2
            (0, "a b a b"),
            # all distinct bigrams
            (1, "w x y z"),
            # single token: no bigram, no output row
            (2, "lonely"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert set(rows) == {0, 1}
    r0 = rows[0]
    assert (r0.n_bigrams, r0.n_uniq_bigrams, r0.top_bigram_n) == (3, 2, 2)
    assert r0.dup_bigram_ratio == pytest.approx(1 - 2 / 3)
    assert r0.top_bigram_ratio == pytest.approx(2 / 3)
    r1 = rows[1]
    assert (r1.n_bigrams, r1.n_uniq_bigrams, r1.top_bigram_n) == (3, 3, 1)
    assert r1.dup_bigram_ratio == 0.0


def test_len_quantiles_exact(spark):
    # en: lengths 1..10 (one each) -> p25=3, p50=5, p90=9, p99=10
    # de: length 7 x4               -> every quantile 7
    rows = [(i, "t", "en", i + 1) for i in range(10)]
    rows += [(100 + i, "t", "de", 7) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    out = {r.lang: r for r in len_quantiles(df).collect()}
    en = out["en"]
    assert (en.n_docs, en.p25, en.p50, en.p90, en.p99) == (10, 3, 5, 9, 10)
    de = out["de"]
    assert (de.n_docs, de.p25, de.p50, de.p90, de.p99) == (4, 7, 7, 7, 7)


def test_pack_sequences_offsets(spark):
    from locus_spark.operators.packing import pack_sequences

    # one shard (n_shards=1): stream order is doc_id asc, budget 10
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g"), (2, "h i j k l"), (3, "m")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pack_sequences(df, budget=10, n_shards=1).collect()}
    # offsets: 0, 4, 7, 12 -> windows 0, 0, 0, 1
    assert [rows[i].start_tok for i in range(4)] == [0, 4, 7, 12]
    assert [rows[i].seq_id for i in range(4)] == [0, 0, 0, 1]
    # sharding keeps streams independent and deterministic
    two = {r.doc_id: r for r in pack_sequences(df, budget=10, n_shards=2).collect()}
    assert two[2].pack_group == 0 and two[2].start_tok == 4  # after doc 0
    assert two[3].pack_group == 1 and two[3].start_tok == 3  # after doc 1


def test_decontaminate_shuffle_path_equivalent(train, eval_docs):
    # broadcast_eval=False must produce the identical survivor set
    kept = sorted(
        r.doc_id
        for r in decontaminate(train, eval_docs, broadcast_eval=False).collect()
    )
    assert kept == [2, 3, 4]


def test_remove_boilerplate_passages_planted(spark):
    """Planted boilerplate: a 4-token passage shared by 3 docs is removed,
    a passage shared by only 2 docs survives, and reassembly preserves the
    original passage order."""
    from locus_spark.operators.textops import remove_boilerplate_passages

    boiler = "click here to subscribe"
    rows = [
        (0, f"{boiler} alpha beta gamma delta"),
        (1, f"{boiler} one two three four"),
        (2, f"epsilon zeta eta theta {boiler}"),
        # "shared pair phrase here" appears in only 2 docs -> kept
        (3, "shared pair phrase here iota kappa lambda mu"),
        (4, "shared pair phrase here nu xi omicron pi"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_passages, r.n_removed)
        for r in remove_boilerplate_passages(
            df, passage_tokens=4, min_doc_freq=3
        ).collect()
    }
    assert got[0] == ("alpha beta gamma delta", 2, 1)
    assert got[1] == ("one two three four", 2, 1)
    assert got[2] == ("epsilon zeta eta theta", 2, 1)
    # under-threshold passages survive, order preserved
    assert got[3] == ("shared pair phrase here iota kappa lambda mu", 2, 0)
    assert got[4] == ("shared pair phrase here nu xi omicron pi", 2, 0)


def test_pmi_collocations_hand_computed(spark):
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from locus_spark.operators.textops import (
        corpus_token_totals,
        pmi_collocations,
    )

    rows = [
        (1, "x y x y x y"),   # bigrams: xy yx xy yx xy
        (2, "x y z"),         # xy yz
        (3, "z"),             # no bigrams (guard path)
        (4, ""),              # empty doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nu, nb = corpus_token_totals(docs)
    assert nu == 10 and nb == 7  # 5 + 2 + 0 + 0 bigrams

    out = pmi_collocations(docs, nu, nb, min_count=2, k=10).collect()
    got = {r["bg"]: (r["c_ab"], r["pmi"]) for r in out}
    # counts: "x y": 4, "y x": 2, "y z": 1 (dropped by min_count)
    assert set(got) == {"x y", "y x"}
    c = {"x": 4, "y": 4, "z": 2}

    def pmi(c_ab, a, b):
        return round(
            math.log((c_ab / nb) / ((c[a] / nu) * (c[b] / nu))), 6
        )

    assert got["x y"] == (4, pmi(4, "x", "y"))
    assert got["y x"] == (2, pmi(2, "y", "x"))
    # ranking: higher PMI first
    assert out[0]["bg"] == "x y"


def test_bigram_lm_scores_hand_computed(spark):
    """Add-1 bigram model trained on doc 0; docs 1-3 scored against it,
    including unseen-bigram and unseen-context fallthrough."""
    import math

    from locus_spark.operators.textops import bigram_lm_scores

    rows = [
        (0, "a b a b c"),   # ref: bigrams ab, ba, ab, bc
        (1, "a b c"),       # seen bigrams: ab(2), bc(1)
        (2, "c a"),         # ca unseen, context c seen once (bc -> c? no: c starts 0 bigrams)
        (3, "q"),           # no bigrams -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter(docs.doc_id == 0)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_scores(docs, ref).collect()
    }
    V = 3 + 1  # ref vocab {a, b, c} + OOV bucket
    cb = {"a b": 2, "b a": 1, "b c": 1}
    cu = {"a": 2, "b": 2}  # left-context counts over ref bigrams

    def lp(bg):
        u = bg.split(" ")[0]
        return math.log((cb.get(bg, 0) + 1.0) / (cu.get(u, 0) + 1.0 * V))

    exp0 = round((lp("a b") + lp("b a") + lp("a b") + lp("b c")) / 4, 6)
    exp1 = round((lp("a b") + lp("b c")) / 2, 6)
    exp2 = round(lp("c a") / 1, 6)
    assert got[0] == (4, exp0)
    assert got[1] == (2, exp1)
    assert got[2] == (1, exp2)
    assert 3 not in got
    # unseen everything == uniform OOV mass: ln(1/V)
    assert exp2 == round(math.log(1.0 / V), 6)
