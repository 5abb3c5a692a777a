"""Similarity search over the embeddings table (``array<float>`` columns).

Two paths, per the training-pipeline mandate:

* ``cosine_topk``     — exact brute-force top-k: probe vectors broadcast
  against the corpus, dot/norms computed with ``zip_with`` + ``aggregate``
  (sequential double accumulation — bit-identical to the DuckDB oracle's
  ``list_dot_product`` on DOUBLE[], verified empirically), ranked by a window.
  This is the baseline and the verifier for the approximate path.
* ``lsh_topk``        — the scale path: random-hyperplane LSH.  Signs against
  ``n_planes`` fixed hyperplanes (seeded, deterministic) bucket the corpus;
  probes only score their own bucket (plus optional multi-probe neighbors at
  Hamming distance 1).  At 10^12 rows the bucket join replaces the full scan;
  recall is tested against ``cosine_topk`` in pytest.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sequential double-accumulate dot product — the exact expression the DuckDB
#: oracle mirrors with list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[])).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot_expr(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def cosine_expr(a: str, b: str) -> F.Column:
    return dot_expr(a, b) / (
        F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b))
    )


def cosine_topk(
    embeddings: DataFrame, probes: DataFrame, k: int, include_self: bool = False
) -> DataFrame:
    """Exact cosine top-k join.  ``probes``: (qid, qvec array<float>).
    Returns (qid, vec_id, cos, rn) ranked by (cos desc, vec_id asc)."""
    pairs = F.broadcast(probes).join(embeddings)
    if not include_self:
        pairs = pairs.filter(F.col("qid") != F.col("vec_id"))
    scored = pairs.select(
        "qid", "vec_id", cosine_expr("embedding", "qvec").alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def make_planes(dim: int, n_planes: int = 12, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes (no wallclock, fixed seed)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_col(vec: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id against the fixed hyperplanes — pure Column math."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        # built via expr to keep one codegen expression per plane
        d = F.expr(_DOT.format(a=vec, b=f"array({', '.join(repr(v) for v in plane)})"))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH — the
    probe scores only corpus vectors sharing its sign-bucket in at least one
    of ``n_tables`` independent plane sets (candidates unioned, then exact
    cosine + window).  Candidate volume ≈ n_tables / 2^n_planes of the
    corpus — the scale knob for 10^12-row runs."""
    corpus = embeddings
    pr = probes
    for t in range(n_tables):
        planes = make_planes(dim, n_planes, seed=7 + 131 * t)
        corpus = corpus.withColumn(f"_b{t}", _bucket_col("embedding", planes))
        pr = pr.withColumn(f"_b{t}", _bucket_col("qvec", planes))
    # candidate pairs: same bucket in any table (union of per-table joins)
    cand = None
    for t in range(n_tables):
        c = (
            F.broadcast(pr.select("qid", "qvec", f"_b{t}"))
            .join(corpus.select("vec_id", "embedding", f"_b{t}"), f"_b{t}")
            .select("qid", "qvec", "vec_id", "embedding")
        )
        cand = c if cand is None else cand.unionByName(c)
    pairs = cand.dropDuplicates(["qid", "vec_id"])
    if not include_self:
        pairs = pairs.filter(F.col("qid") != F.col("vec_id"))
    scored = pairs.select(
        "qid", "vec_id", cosine_expr("embedding", "qvec").alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cluster-probed search —
# the standard alternative scale path to hyperplane LSH.  Everything is
# relational: assignment is an argmax over a literal centroid array (pure
# Column math, whole-stage codegen), the Lloyd update is a
# posexplode→groupBy(cid,pos)→avg (map-side combinable), and the query is a
# cid equi-join + exact cosine + window.  Candidate volume ≈
# n_probe/n_centroids of the corpus — the scale knob.
# --------------------------------------------------------------------------


def _centroid_score_structs(vec: str, centroids: list[list[float]]) -> F.Column:
    """array<struct<c: double, i: int>> of (dot(vec, centroid_i), i).
    Centroids are pre-normalized driver-side, so argmax dot == argmax
    cosine; |vec| scales every entry equally and never flips the argmax
    (dot(s·v, c) = s·dot(v, c) exactly for s a power of two).

    One ``transform`` over a constant-folded array<array<double>> literal —
    a single small expression tree regardless of n_centroids, instead of
    n_centroids independent aggregate subtrees (which bloated codegen and
    the broadcast task binary to >1 MiB at 32×64)."""
    cents = (
        "array("
        + ", ".join(
            "array(" + ", ".join(repr(x) for x in c) + ")" for c in centroids
        )
        + ")"
    )
    return F.expr(
        f"transform({cents}, (c, i) -> struct("
        f"aggregate(zip_with(c, {vec}, (x, y) -> x * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS c, i AS i))"
    )


def _normalize(c: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in c))
    return [x / n for x in c] if n > 0 else c


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 32,
    iters: int = 2,
    dim: int = 64,
    seed: int = 11,
) -> list[list[float]]:
    """Deterministic spherical-k-means coarse quantizer: seeded gaussian
    init, ``iters`` distributed Lloyd rounds (assign by max cosine, update
    by per-dimension mean).  Returns NORMALIZED centroids (unit vectors).

    Scale shape: each round is one argmax-assign pass (codegen'd Column
    math over a broadcast centroid literal) plus one
    posexplode→groupBy(cid, pos)→avg — both map-side combinable; only
    ``n_centroids × dim`` doubles ever reach the driver."""
    rng = random.Random(seed)
    centroids = [
        _normalize([rng.gauss(0.0, 1.0) for _ in range(dim)])
        for _ in range(n_centroids)
    ]
    for _ in range(iters):
        assigned = embeddings.select(
            F.array_max(
                _centroid_score_structs("embedding", centroids)
            )["i"].alias("cid"),
            "embedding",
        )
        rows = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        means: dict[int, list[float]] = {}
        for r in rows:
            means.setdefault(r.cid, [0.0] * dim)[r.pos] = float(r.m)
        # empty clusters keep their previous centroid
        centroids = [
            _normalize(means[i]) if i in means else centroids[i]
            for i in range(n_centroids)
        ]
    return centroids


def ivf_assign(
    embeddings: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(vec_id, embedding, _cid): each vector labeled with its nearest
    centroid — the inverted file.  Persisting this partitioned by ``_cid``
    gives partition-pruned IVF search (build once, query many)."""
    return embeddings.select(
        "vec_id",
        "embedding",
        F.array_max(_centroid_score_structs("embedding", centroids))["i"].alias(
            "_cid"
        ),
    )


def probe_cluster_ids(
    probes: DataFrame, centroids: list[list[float]], n_probe: int
) -> DataFrame:
    """(qid, qvec, _cid) — each probe exploded to its ``n_probe`` nearest
    clusters (its own cluster is always first)."""
    return probes.select(
        "qid",
        "qvec",
        F.explode(
            F.slice(
                F.sort_array(
                    _centroid_score_structs("qvec", centroids), asc=False
                ),
                1,
                n_probe,
            )
        ).alias("_s"),
    ).select("qid", "qvec", F.col("_s")["i"].alias("_cid"))


def ivf_search(
    corpus: DataFrame, pr: DataFrame, k: int
) -> DataFrame:
    """Rank an assigned corpus against exploded probes: cid equi-join +
    exact cosine + per-probe window."""
    pairs = (
        F.broadcast(pr)
        .join(corpus, "_cid")
        .filter(F.col("qid") != F.col("vec_id"))
    )
    scored = pairs.select(
        "qid", "vec_id", cosine_expr("embedding", "qvec").alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int,
    n_centroids: int = 32,
    n_probe: int = 4,
    dim: int = 64,
    iters: int = 2,
    seed: int = 11,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF: the corpus is bucketed by nearest
    centroid (inverted file); each probe scores only the vectors in its
    ``n_probe`` nearest clusters (exact cosine + window inside them).
    Pass pre-trained ``centroids`` to skip the k-means rounds (the
    build-once / query-many path).

    Exactness guarantee used by the planted-copy oracle: a positively
    scaled copy has bit-identical cosines to every centroid (the dot scales
    exactly, the argmax never flips), so it lands in the SAME cluster as
    its original, and a probe's n_probe list always starts with its own
    cluster — the copy is always scored."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids, iters, dim, seed)
    corpus = ivf_assign(embeddings, centroids)
    pr = probe_cluster_ids(probes, centroids, n_probe)
    return ivf_search(corpus, pr, k)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-TABLE hyperplane LSH
    (exact cosine verified on every candidate).  Returns (id_a, id_b, cos).

    Candidates are unioned over ``n_tables`` independent plane sets — a
    single table's recall at the threshold margin is useless (one 12-plane
    table keeps a cos≈0.95 pair with probability ≈0.9¹²≈0.28); with the
    8×8 default a pair at cos 0.95 collides in at least one table with
    probability 1-(1-0.91⁸)⁸ ≈ 0.99 (measured in
    tests/test_pipeline_ops.py::test_embedding_near_dup_jittered_recall).
    Exact-cosine verification means extra candidates cost time, never
    correctness.  Candidate volume ≈ ``n_tables / 2^n_planes`` of the pair
    space — the scale knob for 10^12-row runs."""
    cand = None
    for t in range(n_tables):
        planes = make_planes(dim, n_planes, seed=7 + 131 * t)
        c = embeddings.withColumn("_bucket", _bucket_col("embedding", planes))
        a = c.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "_bucket"
        )
        b = c.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "_bucket"
        )
        p = (
            a.join(b, "_bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
        )
        cand = p if cand is None else cand.unionByName(p)
    pairs = cand.dropDuplicates(["id_a", "id_b"])
    scored = pairs.select("id_a", "id_b", cosine_expr("va", "vb").alias("cos"))
    return scored.filter(F.col("cos") >= threshold)
