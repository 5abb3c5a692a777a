"""Deterministic Common-Crawl-style pages generator (BASELINE input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``).

Generated distributed via ``mapInPandas`` over a ``spark.range`` seed column —
no driver-side materialization, no wallclock, no RNG state shared across
partitions: every field is a pure function of the row index ``i``, so the
table is identical at any parallelism (the property the two-cluster-size
scaling evidence depends on).

Skew by construction: a Zipf-ish share of rows lands on a few hot hosts
(host id = i mod H weighted by the hash trick below), exercising the salted
repartition / AQE skew handling the north rule mandates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

LANGS = ("en", "de", "fr", "es", "ru")

#: fixed vocabulary for the synthetic body text
WORDS = (
    "data spark shuffle join scan filter agg window tile cell point box "
    "segment page host crawl text token index query batch row column value"
).split()

EPOCH_NS = 1767225600 * 10**9  # 2026-01-01T00:00:00Z, fixed

N_HOSTS = 1000
HOT_HOSTS = 5          # hosts 0..4 receive the skewed share
HOT_FRACTION = 0.5     # half of all rows hit the hot hosts


def _mix(i: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style integer mix — vectorized, deterministic."""
    offset = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    z = i.astype(np.uint64) + offset
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def host_of(i: np.ndarray) -> np.ndarray:
    """Skewed host assignment: HOT_FRACTION of rows to HOT_HOSTS hosts."""
    h = _mix(i, 1)
    hot = (h % np.uint64(1000)) < np.uint64(int(HOT_FRACTION * 1000))
    hot_host = _mix(i, 2) % np.uint64(HOT_HOSTS)
    cold_host = np.uint64(HOT_HOSTS) + _mix(i, 3) % np.uint64(N_HOSTS - HOT_HOSTS)
    return np.where(hot, hot_host, cold_host)


#: max words per page (n_words ∈ [5, 5+60))
_MAX_WORDS = 65
_LCG_MUL = np.uint64(6364136223846793005)
_LCG_ADD = np.uint64(1442695040888963407)
_WORDS_ARR = np.array(WORDS)


def _texts_of(idx: np.ndarray) -> pd.Series:
    """Vectorized body text: the same per-row LCG word walk as the original
    scalar implementation (uint64 wraparound == Python int mod 2^64), but run
    as _MAX_WORDS vector steps over the whole batch instead of a Python loop
    per row — the synth hot path at 10^6+ rows/task."""
    n_words = 5 + (_mix(idx, 5) % np.uint64(60)).astype(np.int64)
    s = _mix(idx, 6)
    picks = np.empty((len(idx), _MAX_WORDS), dtype=np.int64)
    for w in range(_MAX_WORDS):  # 65 vector ops, not n_rows Python loops
        s = s * _LCG_MUL + _LCG_ADD
        picks[:, w] = ((s >> np.uint64(33)) % np.uint64(len(WORDS))).astype(np.int64)
    words = _WORDS_ARR[picks]
    return pd.Series(
        [" ".join(row[:n]) for row, n in zip(words, n_words)], dtype="object"
    )


def _pages_batch(idx: np.ndarray) -> pd.DataFrame:
    host = host_of(idx)
    path = _mix(idx, 4)
    urls = pd.Series(
        [f"https://host{h}.example/{p:016x}" for h, p in zip(host, path)],
        dtype="object",
    )
    ts = pd.to_datetime(
        EPOCH_NS + (idx.astype(np.int64) % 86_400) * 10**9, utc=True
    ).tz_localize(None)
    lang = pd.Series(idx % len(LANGS)).map(lambda j: LANGS[j])
    text = _texts_of(idx)
    # invertible wrapping: extract_text(html) == text byte-identically
    # (the per-row invariant the test suite asserts)
    html = ("<html><body><p>" + text + "</p></body></html>").map(
        lambda s: s.encode("utf-8")
    )
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": text, "lang": lang}
    )


def synth_pages(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic pages table with n_rows rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _pages_batch(b["id"].to_numpy())

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def synth_pages_extracted(
    spark: SparkSession, n_rows: int, partitions: int = 32
) -> DataFrame:
    """Pages + ``extracted`` column in ONE ``mapInPandas`` hop.

    Chaining ``synth_pages`` → ``with_extracted_text`` costs a second Python
    stage per task (two workers per core at full parallelism — it halves
    effective throughput at local[4N] and distorts the two-cluster-size
    scaling evidence).  This fused generator applies the very same
    ``extract_text`` function (byte-identity preserved) inside the synth
    batch loop, so each task owns exactly one Python worker."""
    from locus_spark.extract import extract_text

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = _pages_batch(b["id"].to_numpy())
            out["extracted"] = out["html"].map(extract_text)
            yield out

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, PAGES_SCHEMA + ", extracted string")
    )
