"""Connected components over near-duplicate pair lists.

The dedup family (``operators/dedup.py``, ``operators/ann.py``) emits PAIRS
(id_a, id_b); a training-data pipeline needs per-document CLUSTER decisions —
"these d documents are one group, keep the canonical one".  Pairs are a
graph; groups are its connected components; the canonical id is the
component minimum.  Not in the reference (it has no text processing) — this
is the standard distributed-CC building block the dedup surface was missing.

Algorithm: iterative MIN-LABEL PROPAGATION WITH POINTER JUMPING — the
DataFrame rendering of the classic "hash-to-min" / pointer-doubling CC
family (Rastogi et al., ICDE'13; the alternating large-star/small-star of
Kiveris et al., SoCC'14 has the same per-round shuffle shape).  Each round:

1. neighbor step:  l'(u) = min(l(u), min_{v in N(u)} l(v))   (join + groupBy)
2. pointer jump:   l''(u) = min(l'(u), l(l'(u)))             (join on labels)
3. exact fixpoint check: count of rows with l'' < l          (aggregate)

Labels start at l(u) = u and strictly decrease until the fixpoint, so the
count-based termination is exact (no heuristic edge-set hashing).  The jump
step halves the remaining path length, giving O(log diameter) rounds; dedup
graphs are near-star-shaped so 2-4 rounds is typical.

Scale shape: the label frame is |V| rows, the edge frame 2|E| rows; every
round is two key shuffles (on ``u`` and on the jumped label) with map-side
combine on the min aggregates — no step ever materializes a component as a
single row/partition, so a 10^9-node component costs the same per-round
shuffle volume as 10^9 singletons.  Round state is lineage-truncated through
the same checkpoint machinery as the kNN ring loop (local blocks on local
masters, reliable checkpoint dir on clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locus_spark.plans.knn import _truncate_lineage


def connected_components(
    pairs: DataFrame,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_rounds: int = 64,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the smallest node id in the component.

    ``max_rounds`` is a runaway backstop: pointer jumping converges in
    O(log diameter) rounds (64 covers any graph representable in a LONG id
    space); hitting it raises rather than returning a partial labeling.
    """
    edges = (
        pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
        .union(pairs.select(F.col(col_b).alias("u"), F.col(col_a).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = _truncate_lineage(edges)
    labels = _truncate_lineage(
        edges.select("u").distinct().select("u", F.col("u").alias("l"))
    )
    for _ in range(max_rounds):
        # 1. neighbor min: smallest label among u's neighbors
        nbr = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("l").alias("_nl")), "v"
            )
            .groupBy("u")
            .agg(F.min("_nl").alias("_nmin"))
        )
        stepped = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.col("l").alias("_old"),
                F.least("l", F.coalesce("_nmin", "l")).alias("_l1"),
            )
        )
        # 2. pointer jump: follow _l1 to ITS label (labels only decrease, so
        #    l(_l1) <= _l1 and least() is just defensive)
        jumped = (
            stepped.join(
                labels.select(F.col("u").alias("_l1"), F.col("l").alias("_l2")),
                "_l1",
                "left",
            )
            .select(
                "u",
                "_old",
                F.least("_l1", F.coalesce("_l2", "_l1")).alias("l"),
            )
        )
        jumped = _truncate_lineage(jumped)
        # 3. exact fixpoint: labels strictly decrease until converged
        changed = jumped.filter(F.col("l") < F.col("_old")).count()
        labels = jumped.select("u", "l")
        if changed == 0:
            return labels.select(F.col("u").alias("node"), F.col("l").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def assign_clusters(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    col_a: str = "id_a",
    col_b: str = "id_b",
) -> DataFrame:
    """Per-document cluster assignment: (doc_id, cluster_id) for EVERY
    document — members of a near-dup component get the component's smallest
    doc id, untouched documents map to themselves (singleton clusters).
    ``cluster_id == doc_id`` marks the canonical keeper row."""
    comp = connected_components(pairs, col_a=col_a, col_b=col_b)
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )
