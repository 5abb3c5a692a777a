"""URL → point geocoding (north star: "pages ... are geocoded (URL/host →
point)"), all native Column expressions:

* host extracted with ``parse_url`` (JVM builtin);
* host anchor point from ``xxhash64(host)`` — every page of a host lands in
  the same neighborhood (dense hosts ⇒ hot cells, the skew driver);
* per-url jitter from ``xxhash64(url)`` so pages spread around the anchor.

Stays entirely inside whole-stage codegen; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: jitter radius in degrees around the host anchor
JITTER = 2.0


def _unit(h: Column) -> Column:
    """hash → [0, 1) double (pmod by 2^32 then scale — exact dyadic steps)."""
    return F.pmod(h, F.lit(2**32)).cast("double") / F.lit(float(2**32))


def geocode(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (host, x, y) to a pages DataFrame."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    hx = _unit(F.xxhash64(host)) * 360.0 - 180.0
    hy = _unit(F.xxhash64(host, F.lit("y"))) * 180.0 - 90.0
    jx = (_unit(F.xxhash64(F.col(url_col))) - 0.5) * (2 * JITTER)
    jy = (_unit(F.xxhash64(F.col(url_col), F.lit("y"))) - 0.5) * (2 * JITTER)
    return pages.withColumn("host", host).withColumn(
        "x", F.greatest(F.lit(-180.0), F.least(F.lit(180.0), hx + jx))
    ).withColumn(
        "y", F.greatest(F.lit(-90.0), F.least(F.lit(90.0), hy + jy))
    )
