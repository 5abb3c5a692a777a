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
* SimHash        — 64-bit fingerprint as a pure relational plan (distinct
                   tokens → md5 halves → 64 per-bit vote aggregates), fully
                   whole-stage-codegen'd; near-dup = fingerprints at small
                   Hamming distance, found by banding into 4 × 16-bit keys.

Tokenization contract (shared with the DuckDB oracles): split on single
spaces, drop empty tokens, 1-indexed element access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    ).filter(F.size("ts") >= shingle)
    # the length guard above is load-bearing: sequence(1, size - k) with
    # size - k < 1 generates a DESCENDING sequence in Spark (default step
    # -1), so a too-short document would index element_at out of bounds
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


def band_signatures(
    sh: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(doc_id, b, mh) band keys from (doc_id, shingle) rows — the shared
    MinHash kernel of :func:`minhash_lsh_pairs` and the incremental probe.

    All ``bands * rows_per_band`` minhashes in ONE groupBy over the shingle
    rows: permutation p's minhash is ``min(md5("p|" || shingle))``, one
    map-side-combinable MIN aggregate per p.  (Replicating every shingle row
    n_perms times through a join with ``range(n_perms)`` before aggregating
    does the same md5 work over an n_perms× larger pre-aggregation stream.)
    Band keys are then a tiny per-doc explode of the aggregated row."""
    n_perms = bands * rows_per_band
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{p}|"), F.col("shingle")))
            ).alias(f"_m{p}")
            for p in range(n_perms)
        ]
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.concat(
                            *[
                                F.col(f"_m{b * rows_per_band + i}")
                                for i in range(rows_per_band)
                            ]
                        ).alias("mh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("doc_id", F.col("_bk.b").alias("b"), F.col("_bk.mh").alias("mh"))


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

    Exact duplicates are grouped FIRST and only one representative per
    distinct text is banded: identical texts share every band key, so banding
    them all makes the bucket self-join quadratic within each duplicate
    cluster (the r1 skew hazard).  Representative pairs are expanded back
    through the groups afterwards, and within-group pairs get jaccard 1.0
    directly — output is identical to banding everything, minus the O(dups²)
    band-join blowup.
    """
    members = documents.select(F.md5("text").alias("_fp"), "doc_id").cache()
    reps = (
        documents.select(F.md5("text").alias("_fp"), "doc_id", "text")
        .groupBy("_fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
    )
    sh = _doc_shingles(reps.select("doc_id", "text"), shingle).cache()
    # the self-join below would otherwise recompute the whole
    # shingle→hash→minhash subtree once per side
    band_df = band_signatures(sh, bands, rows_per_band).cache()
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
    rep_pairs = (
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
    # expand representative pairs back through the duplicate groups: every
    # member-of-A × member-of-B pair has the same shingle sets, hence the
    # same jaccard
    rep_fp = reps.select(F.col("doc_id").alias("_rid"), "_fp")
    cross = (
        rep_pairs
        .join(
            rep_fp.select(F.col("_rid").alias("id_a"), F.col("_fp").alias("_fp_a")),
            "id_a",
        )
        .join(
            rep_fp.select(F.col("_rid").alias("id_b"), F.col("_fp").alias("_fp_b")),
            "id_b",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_a"), F.col("doc_id").alias("_da")),
            "_fp_a",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_b"), F.col("doc_id").alias("_db")),
            "_fp_b",
        )
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "jaccard",
        )
    )
    # within-group pairs are exact dups (jaccard 1.0 == n/(n+n-n) exactly) —
    # but only for groups whose text actually shingles (< shingle tokens →
    # no bands → never candidates in the unbatched form)
    shingled_fps = rep_fp.join(
        sh.select(F.col("doc_id").alias("_rid")).distinct(), "_rid"
    ).select("_fp")
    within = (
        members.select("_fp", F.col("doc_id").alias("_da"))
        .join(members.select("_fp", F.col("doc_id").alias("_db")), "_fp")
        .filter(F.col("_da") < F.col("_db"))
        .join(shingled_fps, "_fp", "left_semi")
        .select(
            F.col("_da").alias("id_a"),
            F.col("_db").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    out = cross.unionByName(within)
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def ngram_jaccard_pairs(
    documents: DataFrame,
    shingle: int = SHINGLE,
    min_jaccard: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs via a PREFIX-FILTERED inverted
    shingle index — the deterministic sibling of MinHash banding.  Returns
    every pair with ``jaccard ≥ min_jaccard`` as (id_a, id_b, jaccard),
    id_a < id_b.

    Scale shape (AllPairs-style prefix filtering, Bayardo et al. WWW'07):
    under a global shingle order (document frequency asc, shingle asc), only
    each doc's first ``n - ⌈t·n⌉ + 1`` shingles are INDEXED; candidates are
    (full shingle set) ⋈ (prefix index) matches.  Complete for J ≥ t: a
    qualifying pair shares ``I ≥ ⌈t·n_b⌉`` shingles, and at most
    ``⌈t·n_b⌉ - 1`` of them can sit outside b's prefix, so at least one
    common shingle is indexed for b and a's full set probes it.  Rare-first
    ordering makes the indexed entries exactly the low-df shingles, so a
    boilerplate shingle in d docs no longer contributes O(d²) candidate
    pairs unless it genuinely is among a doc's rarest.

    Exact duplicates are pre-grouped (one representative per distinct text is
    shingled/indexed — the same rep/expand scheme as MinHash), so a d-doc
    identical cluster costs O(d) not O(d²); within-group pairs come out with
    jaccard exactly 1.0 (always ≥ t) provided the text shingles at all.

    ``max_df`` is an OPTIONAL extra valve dropping indexed entries above a
    document-frequency cap; it trades completeness for candidate volume on
    pathological boilerplate corpora (within-group exact-dup pairs are still
    always returned).  Default None = exact.

    Everything is joins/groupBys/windows with map-side combine; no UDFs."""
    members = documents.select(F.md5("text").alias("_fp"), "doc_id").cache()
    reps = (
        documents.select(F.md5("text").alias("_fp"), "doc_id", "text")
        .groupBy("_fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
    )
    sh = _doc_shingles(reps.select("doc_id", "text"), shingle).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    from pyspark.sql import Window

    wnd = Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(min_jaccard) * F.col("n_sh")) + F.lit(1)
    )
    idx = (
        sh.join(dfreq, "shingle")
        .join(sizes, "doc_id")
        .withColumn("_rn", F.row_number().over(wnd))
        .filter(F.col("_rn") <= prefix_len)
    )
    if max_df is not None:
        idx = idx.filter(F.col("_df") <= max_df)
    idx = idx.select("doc_id", "shingle")
    cand = (
        sh.select(F.col("doc_id").alias("_d1"), "shingle")
        .join(idx.select(F.col("doc_id").alias("_d2"), "shingle"), "shingle")
        .filter(F.col("_d1") != F.col("_d2"))
        .select(
            F.least("_d1", "_d2").alias("id_a"),
            F.greatest("_d1", "_d2").alias("id_b"),
        )
        .distinct()
    )
    # AllPairs SIZE filter (Bayardo et al. §3): jaccard ≤ min(n)/(na+nb-min(n))
    # (intersection can't exceed the smaller set), so any candidate whose size
    # ratio already caps it under t is dropped BEFORE the expensive joins that
    # attach the full shingle-set arrays.  The bound is computed with the same
    # double division as the final jaccard, and correctly-rounded division is
    # monotone in the true value, so no qualifying pair is ever excluded.
    # ``sizes`` is one row per rep doc — broadcast both sides of the join.
    cand = (
        cand.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id_a"),
                                     F.col("n_sh").alias("na"))), "id_a")
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id_b"),
                                     F.col("n_sh").alias("nb"))), "id_b")
        .filter(
            F.least("na", "nb")
            / (F.col("na") + F.col("nb") - F.least("na", "nb")).cast("double")
            >= F.lit(min_jaccard)
        )
        .select("id_a", "id_b")
    )
    # intersection sizes via per-doc shingle SETS + array_intersect: one row
    # per candidate pair (each carrying two ~n_sh-element arrays), instead of
    # re-exploding every candidate by its full shingle set and re-joining on
    # (id_b, shingle) — that expand was |cand|·n_sh join rows (27M at sf0.1,
    # the dominant stage) for the same counts
    sets_ = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("_set"), F.count("*").alias("n_sh")
    )
    rep_pairs = (
        cand.join(
            sets_.select(
                F.col("doc_id").alias("id_a"),
                F.col("_set").alias("_sa"),
                F.col("n_sh").alias("na"),
            ),
            "id_a",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("id_b"),
                F.col("_set").alias("_sb"),
                F.col("n_sh").alias("nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_inter"),
            "na",
            "nb",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    # expand representative pairs back through the duplicate groups (same
    # scheme as minhash_lsh_pairs): every member×member pair has the same
    # shingle sets, hence the same jaccard
    rep_fp = reps.select(F.col("doc_id").alias("_rid"), "_fp")
    cross = (
        rep_pairs.join(
            rep_fp.select(F.col("_rid").alias("id_a"), F.col("_fp").alias("_fp_a")),
            "id_a",
        )
        .join(
            rep_fp.select(F.col("_rid").alias("id_b"), F.col("_fp").alias("_fp_b")),
            "id_b",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_a"), F.col("doc_id").alias("_da")),
            "_fp_a",
        )
        .join(
            members.select(F.col("_fp").alias("_fp_b"), F.col("doc_id").alias("_db")),
            "_fp_b",
        )
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "jaccard",
        )
    )
    # within-group pairs are exact dups: jaccard exactly 1.0 ≥ any t, but
    # only for texts that actually shingle (< shingle tokens → no pairs)
    shingled_fps = rep_fp.join(
        sh.select(F.col("doc_id").alias("_rid")).distinct(), "_rid"
    ).select("_fp")
    within = (
        members.select("_fp", F.col("doc_id").alias("_da"))
        .join(members.select("_fp", F.col("doc_id").alias("_db")), "_fp")
        .filter(F.col("_da") < F.col("_db"))
        .join(shingled_fps, "_fp", "left_semi")
        .select(
            F.col("_da").alias("id_a"),
            F.col("_db").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# SimHash — a pure relational plan (whole-stage codegen, no Python at all):
# distinct tokens explode → md5 split into two 32-bit halves (JVM) → 64
# per-bit vote aggregates (map-side combinable) → fingerprint assembly.
# Integer-exact end to end, so the whole pipeline is DuckDB-oracle-checkable
# (simhash_oracle_sql below emits the equivalent SQL).
# --------------------------------------------------------------------------

#: signed-long value of bit j (bit 63 is the sign bit)
_BIT_VALUE = [1 << j for j in range(63)] + [-(1 << 63)]


def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fp): 64-bit SimHash over the doc's *distinct* space-split
    tokens.  Token hash = first 16 hex chars of md5, handled as two non-
    negative 32-bit halves (hi = bits 32..63, lo = bits 0..31) so all bit
    extraction is plain long arithmetic.  Docs with no tokens get fp = 0.

    Scale shape: one explode (~tokens rows/doc), one groupBy(doc_id) with 64
    integer sums — partial aggregation does the heavy lifting; no row
    blowup beyond the token explode and no Python workers."""
    toks = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            )
        ).alias("tok"),
    )
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(
                        F.col("hi") if j >= 32 else F.col("lo"), j % 32
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    fp = None
    for j in range(64):
        term = (
            F.when(F.col(f"v{j}") > 0, F.lit(_BIT_VALUE[j]).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        fp = term if fp is None else fp + term
    fps = votes.select("doc_id", fp.alias("fp"))
    return (
        documents.select("doc_id")
        .join(fps, "doc_id", "left")
        .select("doc_id", F.coalesce("fp", F.lit(0).cast("long")).alias("fp"))
    )


def simhash_oracle_sql(max_hamming: int) -> str:
    """DuckDB SQL equivalent of simhash_near_dups over the ``documents``
    view — same tokenization, same md5-half token hash, same votes, same
    banding; everything integer, so results match Spark bit-for-bit."""

    def bit(j: int) -> str:
        col = "hi" if j >= 32 else "lo"
        return f"({col} // {1 << (j % 32)}) % 2"

    votes = ",\n         ".join(
        f"sum(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(64)
    )
    terms = "\n       + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({_BIT_VALUE[j]} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for j in range(64)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t AS tok
  FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS u(t)
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
  FROM toks
), v AS (
  SELECT doc_id, {votes}
  FROM h GROUP BY doc_id
), fpx AS (
  SELECT doc_id, {terms} AS fp FROM v
), fps AS (
  SELECT d.doc_id AS doc_id, coalesce(f.fp, 0) AS fp
  FROM documents d LEFT JOIN fpx f ON d.doc_id = f.doc_id
), banded AS (
  SELECT doc_id, fp, b, (fp >> (16 * CAST(b AS INT))) & 65535 AS key
  FROM fps, unnest([0, 1, 2, 3]) AS u(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.fp AS fp_a, c.fp AS fp_b
  FROM banded a JOIN banded c
    ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}
"""


def _simhash_rep_pairs(fps: DataFrame, max_hamming: int) -> DataFrame:
    """Near-dup pairs between fingerprint REPRESENTATIVES (one doc per
    distinct fp, the group's min doc_id): band self-join + exact popcount
    Hamming verify.  Returns (id_a, id_b, hamming), id_a < id_b."""
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    banded = reps.select(
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
    return (
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
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_clusters(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_id, cluster_id) for every document: connected components of the
    SimHash near-dup graph, cluster_id = smallest doc id in the component.

    Scale shape: the PAIR list is inherently O(d²) for a d-identical cluster
    (every member-pair is a row), so clustering via the expanded pairs would
    re-create the quadratic blowup the rep-grouping avoids.  Components are
    therefore computed on the REPRESENTATIVE graph only (one node per
    distinct fingerprint) and members inherit their rep's component through
    one join.  The component min over reps IS the component min over members:
    each rep is already its fp group's min doc_id."""
    from locus_spark.operators.components import connected_components

    fps = simhash_fingerprints(documents).cache()
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("_rep"))
    rep_pairs = _simhash_rep_pairs(fps, max_hamming)
    comp = connected_components(rep_pairs)
    return (
        fps.join(reps, "fp")
        .join(comp.withColumnRenamed("node", "_rep"), "_rep", "left")
        .select(
            "doc_id",
            F.coalesce("component", "_rep").alias("cluster_id"),
        )
    )


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash banding: fingerprints split into 4 16-bit
    bands; pairs sharing a band are verified with exact popcount Hamming
    distance.  Returns (id_a, id_b, hamming).

    Docs with IDENTICAL fingerprints are grouped FIRST and only one
    representative per distinct ``fp`` enters the band self-join — identical
    fingerprints share all 4 band keys, so banding every member makes a
    d-duplicate cluster emit d² candidate rows per band (the same quadratic
    hazard MinHash fixed in round 1 by banding text representatives).  The
    representative pairs are expanded back through the fp groups afterwards,
    and within-group pairs are emitted with Hamming 0 directly (equal fps
    always share every band, so they are always candidates) — the output is
    identical to banding everything, minus the O(dups²) band-join blowup."""
    fps = simhash_fingerprints(documents).cache()
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    rep_pairs = (
        _simhash_rep_pairs(fps, max_hamming)
        .join(reps.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a")), "id_a")
        .join(reps.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b")), "id_b")
        .select("fp_a", "fp_b", "hamming")
    )
    # cross-group expansion: every member-of-A × member-of-B pair has the
    # same fingerprints, hence the same Hamming distance
    cross = (
        rep_pairs.join(
            fps.select(F.col("fp").alias("fp_a"), F.col("doc_id").alias("_da")), "fp_a"
        )
        .join(
            fps.select(F.col("fp").alias("fp_b"), F.col("doc_id").alias("_db")), "fp_b"
        )
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "hamming",
        )
    )
    # within-group pairs: equal fps share all bands → always candidates,
    # Hamming exactly 0 (and 0 <= max_hamming for any valid budget)
    within = (
        fps.select("fp", F.col("doc_id").alias("_da"))
        .join(fps.select("fp", F.col("doc_id").alias("_db")), "fp")
        .filter(F.col("_da") < F.col("_db"))
        .select(
            F.col("_da").alias("id_a"),
            F.col("_db").alias("id_b"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return cross.unionByName(within)


def incremental_exact_dedup(
    corpus: DataFrame, batch: DataFrame, broadcast_batch: bool = True
) -> DataFrame:
    """Cross-snapshot dedup: keep the new-batch documents whose content is
    not already in the corpus (nor earlier in the batch itself).

    The recurring web-crawl shape: a new snapshot (``batch``) lands next to
    an existing multi-snapshot corpus orders of magnitude larger, and only
    genuinely new content should enter the training mix.  Returns one row
    per kept distinct batch text: ``(doc_id, fp, n_batch_dups)`` where
    ``doc_id`` is the smallest id carrying that text in the batch and
    ``n_batch_dups`` counts its within-batch copies.

    Scale shape (100 TB corpus, ~1% snapshot):

    * The corpus side is ONLY ever a column-pruned scan of ``text``
      projected to a 32-hex md5 — never shuffled, never broadcast: the
      membership probe broadcasts the much smaller BATCH fingerprint set
      and streams the corpus map-side through a ``left_semi`` that emits
      at most |batch| distinct fingerprints (the already-seen set).
    * The batch then drops the already-seen set with an anti-join against
      that tiny result.  Within-batch dedup is one map-side-combined
      groupBy on the fingerprint.
    * ``broadcast_batch=False`` falls back to a plain shuffle ``left_semi``
      on ``fp`` for snapshot sizes beyond broadcast reach (both sides hash
      16-byte keys; still no text ever rides a shuffle).
    """
    batch_fp = batch.select(F.md5("text").alias("fp"), "doc_id")
    kept = batch_fp.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_batch_dups")
    )
    batch_keys = kept.select("fp")
    if broadcast_batch:
        batch_keys = F.broadcast(batch_keys)
    seen = (
        corpus.select(F.md5("text").alias("fp"))
        .join(batch_keys, "fp", "left_semi")
        .distinct()
    )
    if broadcast_batch:
        # |seen| <= |batch fingerprints|, which the probe above already
        # judged broadcastable — so the drop is map-side too, and the whole
        # operator shuffles nothing but the batch's own groupBy
        seen = F.broadcast(seen)
    return kept.join(seen, "fp", "left_anti").select(
        "doc_id", "fp", "n_batch_dups"
    )


#: token width of the repeated-span probe.  Real pipelines (Lee et al.,
#: "Deduplicating Training Data Makes Language Models Better", ACL'22) use
#: 50-token spans over BPE ids; the synthetic fixture's documents are tens
#: of tokens from a small vocabulary, so 8 keeps the cross-document match
#: rate in the regime a 50-gram has against web text.
SPAN_W = 8


def span_dup_stats(documents: DataFrame, w: int = SPAN_W) -> DataFrame:
    """Repeated-substring statistics: for each document, how much of it is
    covered by ``w``-token spans that also appear in ANOTHER document.

    The distributed stand-in for suffix-array substring dedup (Lee et al.
    ACL'22): a suffix array does not shard, so the standard Spark answer is
    fixed-width span fingerprinting — every ``w``-token window is hashed,
    windows seen in >= 2 distinct documents are "duplicated", and each
    document reports ``(doc_id, n_spans, n_dup_spans, dup_frac)`` over its
    window positions.  Downstream policy (drop the doc, or cut the spans)
    filters on ``dup_frac``; documents shorter than ``w`` tokens carry no
    span and are absent (mirrored by the oracle).

    Scale shape: raw span rows are immediately reduced to per-(doc, span)
    counts (one map-side-combined shuffle keyed on the pair), span document
    frequencies aggregate those counts (second combine on the span hash,
    carrying one row per distinct (doc, span), never raw positions), and the
    flag rides back on an equi-join of those two aggregated frames — no
    all-pairs stage, nothing keyed by document alone until the final
    per-doc rollup.  Span text never leaves the first projection: joins and
    aggregations carry the 32-hex md5 only.
    """
    toks = documents.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("ts"),
    ).filter(F.size("ts") >= w)
    joined = " || ' ' || ".join(
        f"element_at(ts, CAST(i + {j} AS INT))" for j in range(w)
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(1, size(ts) - {w - 1}), i -> md5({joined}))")
        ).alias("sp"),
    )
    per_doc_span = spans.groupBy("doc_id", "sp").agg(F.count("*").alias("_c"))
    span_docs = per_doc_span.groupBy("sp").agg(F.count("*").alias("_nd"))
    return (
        per_doc_span.join(span_docs, "sp")
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_spans"),
            F.sum(F.when(F.col("_nd") > 1, F.col("_c")).otherwise(F.lit(0))).alias(
                "n_dup_spans"
            ),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans") / F.col("n_spans").cast("double")).alias(
                "dup_frac"
            ),
        )
    )


def incremental_minhash_dedup(
    corpus_bands: DataFrame,
    corpus: DataFrame,
    batch: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle: int = SHINGLE,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate probe of a new snapshot against a PERSISTED corpus
    MinHash index: batch documents whose text has exact Jaccard >=
    ``min_jaccard`` with some corpus document, without recomputing a single
    corpus signature.

    ``corpus_bands`` is the build-once layout — ``band_signatures`` over one
    representative per distinct corpus text (identical texts share every
    band key, so banding them all would make the candidate join quadratic
    within each duplicate cluster; one representative carries the cluster).
    ``corpus`` supplies representative texts for the verify step by id.
    Returns ``(doc_id, match_id, jaccard)``: every batch document (members
    of duplicate batch texts included) with its best corpus match — highest
    Jaccard, smallest corpus id among equals.

    Scale shape (100 TB corpus, ~1% snapshot):

    * corpus signatures are computed ONCE at index build; per snapshot the
      corpus-side work is two map-side streams — the band layout probed
      against the broadcast batch band keys, and the corpus text scan
      semi-joined to the (tiny) candidate representative ids for verify.
      Nothing corpus-sized is ever shuffled or broadcast.
    * batch-side shingling/banding is snapshot-sized; the verify join
      streams candidate corpus shingles against broadcast batch shingles.
    * the candidate volume knob is the (b, r) S-curve, same as
      :func:`minhash_lsh_pairs` (midpoint ``(1/b)^(1/r)``).
    """
    b_members = batch.select(F.md5("text").alias("_fp"), "doc_id")
    b_reps = (
        batch.select(F.md5("text").alias("_fp"), "doc_id", "text")
        .groupBy("_fp")
        .agg(F.min_by("text", "doc_id").alias("text"))
    )
    bsh = _doc_shingles(
        b_reps.select(F.col("_fp").alias("doc_id"), "text"), shingle
    ).cache()  # keyed by the batch text fingerprint, reused by band + verify
    bb = band_signatures(bsh, bands, rows_per_band).select(
        F.col("doc_id").alias("_fp"), "b", "mh"
    )
    # candidate (batch text, corpus rep) pairs: stream the persisted corpus
    # band layout against the broadcast batch band keys
    cand = (
        corpus_bands.join(F.broadcast(bb), ["b", "mh"])
        .select(F.col("doc_id").alias("_crep"), "_fp")
        .distinct()
    )
    # verify shingles for candidate corpus reps only — a semi-join point
    # lookup into the corpus text, never a full-corpus shingle job
    crep_docs = corpus.join(
        F.broadcast(cand.select(F.col("_crep").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    csh = _doc_shingles(crep_docs, shingle).select(
        F.col("doc_id").alias("_crep"), "shingle"
    )
    inter = (
        csh.join(F.broadcast(cand), "_crep")
        .join(
            F.broadcast(bsh.select(F.col("doc_id").alias("_fp"), "shingle")),
            ["_fp", "shingle"],
        )
        .groupBy("_fp", "_crep")
        .agg(F.count("*").alias("_ni"))
    )
    b_sizes = bsh.groupBy("doc_id").agg(F.count("*").alias("_nb")).select(
        F.col("doc_id").alias("_fp"), "_nb"
    )
    c_sizes = csh.groupBy("_crep").agg(F.count("*").alias("_nc"))
    verified = (
        inter.join(F.broadcast(b_sizes), "_fp")
        .join(F.broadcast(c_sizes), "_crep")
        .select(
            "_fp",
            "_crep",
            (
                F.col("_ni")
                / (F.col("_nb") + F.col("_nc") - F.col("_ni")).cast("double")
            ).alias("_j"),
        )
        .filter(F.col("_j") >= F.lit(min_jaccard))
    )
    # best match per batch text: highest jaccard, smallest corpus id among
    # equals — one max-of-struct agg (~id is strictly order-reversing over
    # the whole long range, unlike -id at Long.MIN_VALUE)
    best = verified.groupBy("_fp").agg(
        F.max(
            F.struct(
                F.col("_j").alias("j"), F.bitwise_not("_crep").alias("t")
            )
        ).alias("_s")
    ).select(
        "_fp",
        F.bitwise_not(F.col("_s.t")).alias("match_id"),
        F.col("_s.j").alias("jaccard"),
    )
    return b_members.join(F.broadcast(best), "_fp").select(
        "doc_id", "match_id", "jaccard"
    )
