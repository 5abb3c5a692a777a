"""The text-scaling harness corpus (tools/bench_text_scaling.py): the
deterministic generator must produce stable bytes, true even/odd near-dup
structure, and a pure-JVM plan (no Python operators in the generator)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from bench_text_scaling import DOC_TOKENS, build_corpus  # noqa: E402


def test_corpus_deterministic_and_near_dup_pairs(spark):
    a = {r["doc_id"]: r["text"] for r in build_corpus(spark, 200).collect()}
    b = {r["doc_id"]: r["text"] for r in build_corpus(spark, 200).collect()}
    assert a == b and len(a) == 200

    for even in range(0, 200, 2):
        ta, tb = a[even].split(" "), a[even + 1].split(" ")
        assert len(ta) == len(tb) == DOC_TOKENS
        diffs = sum(1 for x, y in zip(ta, tb) if x != y)
        # odd docs replace exactly position 7 (equal only if the alt token
        # hashes to the same vocab word)
        assert diffs <= 1
        assert ta[:7] == tb[:7] and ta[8:] == tb[8:]


def test_corpus_generator_is_jvm_only(spark):
    plan = (
        build_corpus(spark, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure Column exprs, not even Arrow
