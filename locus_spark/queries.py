"""Query registry: every implemented operator as a (spark_fn, oracle_sql)
pair — the driver contract surface (``__spark_entry__.py`` re-exports this).

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is ANSI SQL DuckDB runs on the same parquet views.  Geometry
derivations and distance metrics are shared SQL text (see sources/derived.py
and functions/metrics.py), so floats agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locus_spark.cells import GridSpec
from locus_spark.functions.metrics import (
    sql_dist2_point_point,
)
from locus_spark.operators.points import (
    find_ball_join,
    find_box_join,
    knn_join,
    nearest_join,
)
from locus_spark.sources import derived

#: grid resolution for sf-scale runs — 64x64 cells keeps covering explosions
#: small at these extents while still pruning partitions; raise for larger SFs.
SF_RESOLUTION = 6

#: fixed world grid for the derived geometry domain ([-180,180] x [-90,90])
#: — avoids a bounds-scan job per query and keeps plans stable.
WORLD_GRID = GridSpec(-180.0, -90.0, 180.0, 90.0, SF_RESOLUTION)

KNN_K = 3

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ===========================================================================
# kd-family point queries (SURVEY.md §2.2)
# ===========================================================================

_FIND_BOX_ORACLE = f"""
{derived.with_ctes('points', 'query_boxes')}
SELECT q.qid AS qid, p.id AS id, p.x AS x, p.y AS y
FROM query_boxes q
JOIN points p
  ON p.x >= q.min_x AND p.x <= q.max_x AND p.y >= q.min_y AND p.y <= q.max_y
"""


@register("kd_find_box", _FIND_BOX_ORACLE)
def kd_find_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 find_box_items (/root/reference/locus/kd.py:449-507) as a range join."""
    pts = derived.load(spark, sf_dir, "points")
    qb = derived.load(spark, sf_dir, "query_boxes")
    return find_box_join(pts, qb, grid=WORLD_GRID)


_D2_PQ = sql_dist2_point_point("p.x", "p.y", "q.x", "q.y")

_FIND_BALL_ORACLE = f"""
{derived.with_ctes('points', 'query_circles')}
SELECT q.qid AS qid, p.id AS id, p.x AS x, p.y AS y, {_D2_PQ} AS dist2
FROM query_circles q
JOIN points p
  ON {_D2_PQ} <= q.r * q.r
"""


@register("kd_find_ball", _FIND_BALL_ORACLE)
def kd_find_ball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11 ball search (pre-v5 find_ball; vestigial strategy at
    /root/reference/tests/kd_tests/strategies.py:71-90)."""
    pts = derived.load(spark, sf_dir, "points")
    qc = derived.load(spark, sf_dir, "query_circles")
    return find_ball_join(pts, qc, grid=WORLD_GRID)


_KNN_ORACLE_TMPL = f"""
{derived.with_ctes('points', 'query_points')}
, cand AS (
  SELECT q.qid AS qid, p.id AS id, p.x AS x, p.y AS y, {_D2_PQ} AS dist2
  FROM query_points q CROSS JOIN points p
), ranked AS (
  SELECT qid, id, x, y, dist2,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, id) AS rn
  FROM cand
)
SELECT qid, id, x, y, dist2{{rn_col}}
FROM ranked WHERE rn <= {{k}}
"""


@register("kd_knn", _KNN_ORACLE_TMPL.format(k=KNN_K, rn_col=", rn"))
def kd_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 n_nearest_items (/root/reference/locus/kd.py:176-253) as an exact
    kNN join via cell-ring expansion."""
    pts = derived.load(spark, sf_dir, "points")
    qp = derived.load(spark, sf_dir, "query_points")
    return knn_join(pts, qp, KNN_K, grid=WORLD_GRID)


@register("kd_nearest", _KNN_ORACLE_TMPL.format(k=1, rn_col=""))
def kd_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 nearest_item (/root/reference/locus/kd.py:320-374): kNN join, k=1."""
    pts = derived.load(spark, sf_dir, "points")
    qp = derived.load(spark, sf_dir, "query_points")
    return nearest_join(pts, qp, grid=WORLD_GRID)
