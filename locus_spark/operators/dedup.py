"""Deduplication operators for the training-data pipeline.

Not present in the reference (it has no text processing); these are the
standard large-scale dedup family expressed Spark-first:

* exact          — content fingerprint (md5) groupBy; one shuffle on the
                   fingerprint, map-side combine does the heavy lifting;
* MinHash + LSH  — shingle → per-band minhash (md5 order statistics, no
                   custom hash needed: min over an md5-keyed permutation IS a
                   minhash) → band-bucket self-join → exact Jaccard verify.
                   All set algebra happens on (doc, shingle) rows — joins and
                   groupBys, no UDFs;
* SimHash        — 64-bit fingerprint via a vectorized Arrow pandas UDF
                   (bit-twiddling is the one thing Columns don't do well);
                   near-dup = fingerprints at small Hamming distance, found by
                   banding the fingerprint into 4 × 16-bit keys.

Tokenization contract (shared with the DuckDB oracles): split on single
spaces, drop empty tokens, 1-indexed element access.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

DEFAULT_BANDS = 8
SHINGLE = 3


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Content-hash dedup: one row per distinct text with the keeper id
    (smallest doc_id) and the duplicate count.
    Returns (fp, keep_id, n_docs)."""
    return (
        documents.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


def _doc_shingles(documents: DataFrame, shingle: int = SHINGLE) -> DataFrame:
    """Distinct (doc_id, shingle) rows: word n-grams over space-split tokens
    (1-indexed element_at, matching the oracle's 1-indexed lists)."""
    toks = documents.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("ts"),
    )
    joined = " || ' ' || ".join(
        f"element_at(ts, CAST(i + {j} AS INT))" for j in range(shingle)
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(1, size(ts) - {shingle - 1}), i -> {joined})")
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_lsh_pairs(
    documents: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle: int = SHINGLE,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Near-duplicate candidate pairs by banded MinHash LSH, verified with
    exact shingle-set Jaccard.  Returns (id_a, id_b, jaccard), id_a < id_b.

    Classic (b, r) banding: ``bands * rows_per_band`` independent minhash
    permutations; a band's key is the concatenation of its ``r`` minhashes,
    so a pair becomes a candidate with probability ``1-(1-j^r)^b`` — the
    S-curve with midpoint ``(1/b)^(1/r)`` (0.5 at the 4x2 default).  r=1
    degenerates to "any single minhash collides", which at web scale admits
    a quadratic tail of low-jaccard candidate pairs and makes the exact
    verify join the job's bottleneck; r>=2 suppresses that tail.

    Scale shape: shingling explodes ~L rows/doc; per-permutation minhash is a
    map-side-combinable groupBy; the bucket self-join only pairs docs sharing
    a whole band key, and the Jaccard verify joins only candidate pairs'
    shingle sets.
    """
    n_perms = bands * rows_per_band
    sh = _doc_shingles(documents, shingle).cache()
    band_df = (
        sh.join(
            F.broadcast(
                sh.sparkSession.range(n_perms).select(
                    F.col("id").cast("int").alias("p")
                )
            )
        )
        .select(
            "doc_id",
            (F.col("p") / rows_per_band).cast("int").alias("b"),
            F.col("p"),
            F.md5(
                F.concat(F.col("p").cast("string"), F.lit("|"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "b")
        .agg(
            F.concat(
                *[
                    # slot i's minhash = min h among rows of permutation
                    # p = b*rows_per_band + i (map-side combinable)
                    F.min(F.when(F.col("p") % rows_per_band == i, F.col("h")))
                    for i in range(rows_per_band)
                ]
            ).alias("mh")
        )
        # the self-join below would otherwise recompute the whole
        # shingle→hash→minhash subtree once per side
        .cache()
    )
    a, c = band_df.alias("a"), band_df.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.mh") == F.col("c.mh"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


# --------------------------------------------------------------------------
# SimHash (vectorized Arrow UDF — no oracle; verified by pytest properties)
# --------------------------------------------------------------------------

@pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over space-split tokens.  Vectorized per Arrow batch:
    token hashing via numpy's bit-mixing of md5 digests would need Python
    loops, so we use a splitmix-style integer mix over token byte sums —
    deterministic, batch-local, no per-row Python beyond the tokenizer."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):  # per-doc loop, token math vectorized
        toks = [w for w in (t or "").split(" ") if w]
        if not toks:
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for w in set(toks)
            ],
            dtype=np.uint64,
        )
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes = np.where(bits == 1, 1, -1).sum(axis=0)
        fp = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(j)
        out[i] = np.int64(fp.astype(np.int64))
    return pd.Series(out)


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash banding: fingerprints split into 4 16-bit
    bands; pairs sharing a band are verified with exact popcount Hamming
    distance.  Returns (id_a, id_b, hamming)."""
    fps = documents.select("doc_id", simhash64(F.col("text")).alias("fp"))
    banded = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("fp", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "fp", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
