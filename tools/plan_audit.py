#!/usr/bin/env python
"""Physical-plan audit of every registered query: one row per query with
the plan-shape counters that matter at 100 TB (shuffles, join strategies,
whole-stage-codegen spans, Python/Arrow boundaries, windows), plus a lint
for join shapes that are scale hazards unless intentional.

Writes PLAN_AUDIT.md.  This is the repo's standing answer to "did you
.explain() every operator": regenerate after plan-affecting changes with

    python tools/plan_audit.py [sf_dir]

Counters come from the INITIAL physical plan (no query execution beyond
what side-state builds need; AQE may further coalesce at runtime, never
add exchanges).
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from locus_spark.session import get_spark  # noqa: E402

#: queries whose nested-loop/cartesian joins are the DOCUMENTED small-side
#: contract, not an accident (brute-force verifiers, 1-row scalar frames,
#: bounded probe literals).
INTENTIONAL_NESTED_LOOP = {
    "dedup_embedding_cosine": "exact all-pairs verifier (documented small-scale-only)",
    "ann_cosine_topk": "brute-force baseline: broadcast probes x corpus scan",
    "ann_lsh_recall": "carries the brute-force exact side by design",
    "ann_ivf_recall": "carries the brute-force exact side by design",
    "ann_pq_recall": "carries the brute-force exact side by design",
    "ann_lsh_topk_planted": "planted-equality row joins the exact side",
    "ann_ivf_topk_planted": "planted-equality row joins the exact side",
    "doc_heavy_hitters": "1-row total-count frame broadcast-crossed into the filter",
    "doc_hits": "1-row L1-normalizer frame broadcast-crossed into each half-step "
    "(replaces the round-4 per-half-step driver collect)",
    "events_anomaly": "1-row corpus mean/std frame broadcast-crossed into the "
    "z-score projection (stats bounded by the time horizon, never event volume)",
    "doc_top_quality": "1-row per-group cutoff frame",
    "pipeline_training_mix": "1-row per-group cutoff frame",
    # the *_over_layout queries broadcast the (explicitly small, documented)
    # probe-box table and theta-join its containment predicate against the
    # cell-IN-pruned layout scan — BuildLeft on the probe side, the layout
    # side stays a pruned columnar scan (operators/points.py:121 contract)
    "kd_find_box_persisted": "broadcast small probe boxes x pruned layout scan",
    "kd_find_box_incremental": "broadcast small probe boxes x pruned merged layout",
    "r_find_subsets_persisted": "broadcast small probe boxes x pruned layout scan",
}

#: queries whose SortMergeJoin is the DOCUMENTED two-data-sized-sides
#: contract, not a missed broadcast.
INTENTIONAL_SORTMERGE = {
    "pages_dbscan": (
        "core-core semi-join (eps-pairs ⋉ core set): BOTH sides are "
        "data-sized (O(|P|) rows each) at any scale, so a shuffle join is "
        "the 100-TB-correct shape — broadcasting the core set would be "
        "wrong at scale.  kd_dbscan runs the same plan; AQE converts its "
        "smaller runtime core set to a broadcast join at sf0.001-0.1, and "
        "may do the same here when the runtime size allows."
    ),
}

PATTERNS = {
    "exchanges": r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)",
    "broadcast_joins": r"BroadcastHashJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "nested_loop": r"BroadcastNestedLoopJoin|CartesianProduct",
    "wscg_spans": r"WholeStageCodegen subtrees",  # replaced below by count
    "python_arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython",
    "windows": r"\bWindow\b",
}


def audit(plan: str, codegen_plan: str) -> dict[str, int]:
    out = {}
    for k, pat in PATTERNS.items():
        if k == "wscg_spans":
            # "Found N WholeStageCodegen subtrees." header of codegen mode
            m = re.search(r"Found (\d+) WholeStageCodegen", codegen_plan)
            out[k] = int(m.group(1)) if m else 0
        else:
            out[k] = len(re.findall(pat, plan))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="plan_audit", master="local[4]", shuffle_partitions=4
    )
    from locus_spark import queries as q

    rows, problems = [], []
    for name, fn in q.queries().items():
        try:
            df = fn(spark, sf_dir)
            # execute so AQE finalizes: counters reflect the plan that RAN
            # (AQE broadcast conversions and coalesced exchanges included),
            # not the pre-runtime guess.  Result sets are small at sf0.001.
            df.collect()
            qe = df._jdf.queryExecution()
            # a finalized AdaptiveSparkPlan prints "== Final Plan ==" AND
            # "== Initial Plan ==" — count only the plan that ran
            plan = qe.executedPlan().toString().split("== Initial Plan ==")[0]
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "codegen"
            )
            codegen_plan = qe.explainString(mode)
        except Exception as exc:  # pragma: no cover - audit robustness
            problems.append(f"{name}: PLAN FAILED — {exc}")
            continue
        c = audit(plan, codegen_plan)
        c["rowlike_python"] = len(re.findall(r"BatchEvalPython", plan))
        rows.append((name, c))
        if c["nested_loop"] and name not in INTENTIONAL_NESTED_LOOP:
            problems.append(
                f"{name}: {c['nested_loop']} nested-loop/cartesian join(s) "
                "not on the intentional list"
            )
        if c["sortmerge_joins"] and name not in INTENTIONAL_SORTMERGE:
            problems.append(
                f"{name}: {c['sortmerge_joins']} SortMergeJoin(s) not on "
                "the intentional list (missed broadcast, or annotate)"
            )
        if c["rowlike_python"]:
            problems.append(
                f"{name}: BatchEvalPython (row-at-a-time Python UDF) in plan"
            )

    lines = [
        "# PLAN_AUDIT — physical-plan shapes of every registered query",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` over "
        f"{len(rows)} queries.",
        "",
        "Columns: Exchange count (shuffles), join strategies, distinct",
        "whole-stage-codegen span ids, Arrow-batched Python operators",
        "(`ArrowEvalPython`/`MapInPandas`/grouped-map — the sanctioned UDF",
        "surface), window operators.  Row-at-a-time `BatchEvalPython` is a",
        "lint failure (the input_hint mandates no per-row Python).",
        "",
        "| query | exchanges | bcast HJ | SMJ | shuffled HJ | nested-loop | WSCG spans | arrow py | windows |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, c in rows:
        nl = str(c["nested_loop"])
        if c["nested_loop"] and name in INTENTIONAL_NESTED_LOOP:
            nl += " (intentional)"
        smj = str(c["sortmerge_joins"])
        if c["sortmerge_joins"] and name in INTENTIONAL_SORTMERGE:
            smj += " (intentional)"
        lines.append(
            f"| {name} | {c['exchanges']} | {c['broadcast_joins']} | "
            f"{smj} | {c['shuffled_hash_joins']} | {nl} | "
            f"{c['wscg_spans']} | {c['python_arrow']} | {c['windows']} |"
        )
    lines += ["", "## Intentional nested-loop/cartesian shapes", ""]
    for name, why in sorted(INTENTIONAL_NESTED_LOOP.items()):
        lines.append(f"- `{name}` — {why}")
    lines += ["", "## Intentional SortMergeJoin shapes", ""]
    for name, why in sorted(INTENTIONAL_SORTMERGE.items()):
        lines.append(f"- `{name}` — {why}")
    lines += ["", "## Lint", ""]
    if problems:
        lines += [f"- **{p}**" for p in problems]
    else:
        lines.append(
            "- clean: no unintentional nested-loop/cartesian joins, no "
            "unannotated SortMergeJoins, no row-at-a-time Python UDFs "
            "anywhere in the registry."
        )
    (REPO / "PLAN_AUDIT.md").write_text("\n".join(lines) + "\n")
    print(f"PLAN_AUDIT.md written: {len(rows)} queries, {len(problems)} lint findings")
    for p in problems:
        print("LINT:", p)


if __name__ == "__main__":
    main()
