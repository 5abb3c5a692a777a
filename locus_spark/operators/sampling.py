"""Deterministic sampling / dataset-mixing operators.

A training-data pipeline rebalances its mix (per-language, per-source
quotas) with REPRODUCIBLE sampling: the keep/drop decision must be a pure
function of (row key, seed), not of Spark's RNG or partition layout —
otherwise a rerun, a retry, or a different partitioning samples a different
corpus.  ``df.sample()`` gives none of those guarantees; hash-threshold
sampling gives all of them and is a stateless Column expression (codegen'd,
embarrassingly parallel, no shuffle).

Keep rule: ``uint32(md5(seed ':' key)[:8]) < floor(rate * 2^32)`` — the
threshold is an exact integer so Spark and any oracle engine agree
bit-for-bit, and rates compose monotonically (a 0.2 sample is a subset of a
0.5 sample at the same seed, which makes downscaling a mix reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: str) -> Column:
    """uint32 hash bucket of a row key: first 8 md5 hex chars as a long."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def threshold(rate: float) -> int:
    """Exact integer keep-threshold for a rate (clamped to [0, 1])."""
    return int(max(0.0, min(1.0, rate)) * (1 << 32))


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: str = "locus"
) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col``."""
    return df.filter(_bucket(F.col(key_col), seed) < F.lit(threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: str = "locus",
) -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum ``s`` are kept at
    ``rates[s]`` (``default_rate`` otherwise).  One filter expression — no
    shuffle, no per-stratum pass; the mix rebalance a 100-TB corpus needs.
    """
    thr: Column = F.lit(threshold(default_rate))
    for stratum in sorted(rates):  # deterministic plan text
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(threshold(rates[stratum]))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(key_col), seed) < thr)


def sample_oracle_predicate(
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: str = "locus",
) -> str:
    """DuckDB WHERE-clause equivalent of :func:`stratified_sample` — same
    md5-prefix bucket, same integer thresholds."""
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {threshold(rates[s])}"
        for s in sorted(rates)
    )
    return (
        f"('0x' || substr(md5('{seed}:' || CAST({key_col} AS VARCHAR)), 1, 8))::BIGINT"
        f" < (CASE {cases} ELSE {threshold(default_rate)} END)"
    )
