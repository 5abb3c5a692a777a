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

import numpy as np
import pandas as pd
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
# the standard alternative scale path to hyperplane LSH.  Centroid scoring is
# an Arrow-vectorized pandas_udf (one numpy V @ C.T matmul per batch — NOT
# per-row Python; ~100× the interpreted higher-order-function form, whose
# per-row lambda walk dominated wall time at 50k×32×64).  The Lloyd update is
# a posexplode→groupBy(cid,pos)→avg (map-side combinable), and the query is a
# cid equi-join + exact cosine + window.  Candidate volume ≈
# n_probe/n_centroids of the corpus — the scale knob.
# --------------------------------------------------------------------------


def _top_cids_udf(centroids: list[list[float]], n: int):
    """pandas_udf: embedding -> array<int> of the ``n`` highest-dot centroid
    ids, score-desc (ties: lower id first — stable argsort, matching the
    argmax-lowest-wins of the n=1 assignment path).

    Centroids are pre-normalized driver-side, so top-by-dot == top-by-cosine;
    |vec| scales every score equally and never reorders them (numpy computes
    dot(s·v, c) = s·dot(v, c) exactly for s a power of two, so a planted
    scaled copy ranks centroids identically to its original — the property
    the planted-copy oracle relies on)."""
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(centroids, dtype=np.float64).T  # (dim, k)

    @pandas_udf("array<int>")
    def top_cids(emb: pd.Series) -> pd.Series:
        v = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        order = np.argsort(-(v @ mat), axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype(np.int32)))

    return top_cids


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

    Scale shape: each round is one argmax-assign pass (Arrow-batched numpy
    matmul against the closure-captured centroid matrix) plus one
    posexplode→groupBy(cid, pos)→avg — both map-side combinable; only
    ``n_centroids × dim`` doubles ever reach the driver."""
    rng = random.Random(seed)
    centroids = [
        _normalize([rng.gauss(0.0, 1.0) for _ in range(dim)])
        for _ in range(n_centroids)
    ]
    for _ in range(iters):
        assigned = embeddings.select(
            F.element_at(
                _top_cids_udf(centroids, 1)("embedding"), 1
            ).alias("cid"),
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
        F.element_at(_top_cids_udf(centroids, 1)("embedding"), 1).alias("_cid"),
    )


def probe_cluster_ids(
    probes: DataFrame, centroids: list[list[float]], n_probe: int
) -> DataFrame:
    """(qid, qvec, _cid) — each probe exploded to its ``n_probe`` nearest
    clusters.  Same scorer (and tie rule) as ``ivf_assign``, so a probe's
    own cluster is always its first probed cluster."""
    return probes.select(
        "qid",
        "qvec",
        F.explode(_top_cids_udf(centroids, n_probe)("qvec")).alias("_cid"),
    )


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


def _sign_buckets_udf(plane_sets: list[list[list[float]]]):
    """pandas_udf: embedding -> array<long> of one sign-bucket id per table,
    all ``b × r`` hyperplane dots in a single Arrow-batched numpy matmul.
    Buckets only GATE candidate generation (never output values), so the
    numpy dot needs no bit-parity with the SQL dot — only scale-invariance:
    sign(dot(s·v, p)) == sign(dot(v, p)) exactly for s > 0, so a planted
    positive scaling shares every bucket with its original."""
    from pyspark.sql.functions import pandas_udf

    b, r = len(plane_sets), len(plane_sets[0])
    mat = np.asarray(
        [pl for planes in plane_sets for pl in planes], dtype=np.float64
    ).T  # (dim, b*r)
    weights = 1 << np.arange(r, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(emb: pd.Series) -> pd.Series:
        v = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        signs = (v @ mat) > 0.0
        ids = (signs.reshape(len(v), b, r) * weights).sum(axis=2)
        return pd.Series(list(ids))

    return buckets


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 32,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-TABLE hyperplane LSH
    (exact cosine verified on every candidate).  Returns (id_a, id_b, cos).

    Candidate generation is ONE self-equi-join: every vector explodes to its
    (table, bucket) keys — 16-byte rows, no vector payload — and pairs
    sharing a key in any table survive a distinct.  Only the distinct
    survivors re-join the corpus (twice, on vec_id) to fetch vectors for the
    exact-cosine verify, so the wide 8·dim-byte embeddings never ride
    through the candidate shuffle (the r2 form shuffled them through every
    per-table join + the dedup and was 5× slower than the single-table it
    replaced).

    AND-OR tuning (16 planes AND within a table, 32 tables OR): a pair at
    cos 0.90 collides in at least one table with probability
    1-(1-0.856¹⁶)³² ≈ 0.94, at cos 0.95 ≈ 0.998 (measured in
    tests/test_pipeline_ops.py::test_embedding_near_dup_jittered_recall),
    while an unrelated pair (cos≈0) survives with 32/2¹⁶ ≈ 0.05% — the
    r=8 table of r2 let 3% of ALL pairs through, which is what exploded the
    candidate volume.  Exact-cosine verification means extra candidates
    cost time, never correctness.

    BIT-IDENTICAL vectors are pre-grouped and only one representative per
    distinct vector is bucketed (the rep/expand scheme of minhash_lsh_pairs):
    identical vectors share every (table, bucket) key, so bucketing them all
    makes the self-join emit n_tables·d² rows for a d-identical cluster —
    the dup-cluster quadratic hazard at web scale, where a boilerplate
    embedding can recur 10⁵ times.  The vector fingerprint is md5 over the
    shortest-round-trip string forms (Spark's double→string cast is Ryu,
    round-trip exact), so distinct doubles never collide.  Expanded member
    pairs and within-group pairs all flow through the SAME exact-cosine
    verify as rep pairs, so output values are identical to bucketing
    everything (no shortcut literals — the oracle computes every cosine)."""
    plane_sets = [
        make_planes(dim, n_planes, seed=7 + 131 * t) for t in range(n_tables)
    ]
    vec_fp = F.md5(
        F.concat_ws(",", F.transform(F.col("embedding"), lambda x: x.cast("string")))
    )
    members = embeddings.select(vec_fp.alias("_fp"), "vec_id").cache()
    reps = (
        embeddings.select(vec_fp.alias("_fp"), "vec_id", "embedding")
        .groupBy("_fp")
        .agg(
            F.min("vec_id").alias("vec_id"),
            F.min_by("embedding", "vec_id").alias("embedding"),
        )
    )
    bk = reps.select(
        "vec_id",
        F.posexplode(_sign_buckets_udf(plane_sets)("embedding")).alias(
            "_t", "_bkt"
        ),
    )
    # fuse (table, bucket) into ONE long join key: a single-long equi-join
    # key gives Spark a LongHashedRelation / long-keyed shuffle instead of
    # the composite-key BytesToBytesMap relation, whose lookup path was
    # measured (plans/knn.py) to stop scaling with cores; bucket ids are
    # sign-bit integers < 2^n_planes << 2^32, so table<<32 | bucket is
    # collision-free
    bk = bk.select(
        "vec_id",
        (F.col("_t").cast("long") * F.lit(1 << 32) + F.col("_bkt")).alias("_tb"),
    )
    a = bk.select(F.col("vec_id").alias("id_a"), "_tb")
    b = bk.select(F.col("vec_id").alias("id_b"), "_tb")
    rep_ids = (
        a.join(b, ["_tb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # expand rep pairs through the duplicate groups (members of A × members
    # of B — identical vectors, hence the same cosine), and add within-group
    # pairs (d·(d-1)/2 true dup pairs — output rows, not candidate waste)
    rep_fp = reps.select(F.col("vec_id").alias("_rid"), "_fp")
    cross = (
        rep_ids.join(
            rep_fp.select(F.col("_rid").alias("id_a"), F.col("_fp").alias("_fp_a")),
            "id_a",
        )
        .join(
            rep_fp.select(F.col("_rid").alias("id_b"), F.col("_fp").alias("_fp_b")),
            "id_b",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_a"), F.col("vec_id").alias("_va")),
            "_fp_a",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_b"), F.col("vec_id").alias("_vb")),
            "_fp_b",
        )
        .select(
            F.least("_va", "_vb").alias("id_a"),
            F.greatest("_va", "_vb").alias("id_b"),
        )
    )
    within = (
        members.select("_fp", F.col("vec_id").alias("_va"))
        .join(members.select("_fp", F.col("vec_id").alias("_vb")), "_fp")
        .filter(F.col("_va") < F.col("_vb"))
        .select(F.col("_va").alias("id_a"), F.col("_vb").alias("id_b"))
    )
    ids = cross.unionByName(within)
    va = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    # vec_id equi-joins; AQE broadcasts the corpus side when it fits
    pairs = ids.join(va, "id_a").join(vb, "id_b")
    scored = pairs.select("id_a", "id_b", cosine_expr("va", "vb").alias("cos"))
    return scored.filter(F.col("cos") >= threshold)
