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
    sql_dist2_point_box,
    sql_dist2_point_point,
    sql_dist2_point_segment,
    sql_dist2_segment_segment,
)
from locus_spark.operators.boxes import (
    box_knn_join,
    box_nearest_join,
    find_subsets_join,
    find_supersets_join,
)
from locus_spark.operators.points import (
    find_ball_join,
    find_box_join,
    knn_join,
    nearest_join,
)
from locus_spark.operators.segments import (
    segment_knn_join,
    segment_knn_to_point_join,
    segment_nearest_to_point_join,
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


# ===========================================================================
# R-tree-family box queries (SURVEY.md §2.3)
# ===========================================================================

_BOX_OUT = "b.id AS id, b.min_x AS min_x, b.max_x AS max_x, b.min_y AS min_y, b.max_y AS max_y"

_SUBSETS_ORACLE = f"""
{derived.with_ctes('boxes', 'query_boxes')}
SELECT q.qid AS qid, {_BOX_OUT}
FROM query_boxes q
JOIN boxes b
  ON q.min_x <= b.min_x AND b.max_x <= q.max_x
 AND q.min_y <= b.min_y AND b.max_y <= q.max_y
"""


@register("r_find_subsets", _SUBSETS_ORACLE)
def r_find_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 find_subsets_items (/root/reference/locus/r.py:190-235)."""
    b = derived.load(spark, sf_dir, "boxes")
    q = derived.load(spark, sf_dir, "query_boxes")
    return find_subsets_join(b, q, grid=WORLD_GRID)


_SUPERSETS_ORACLE = f"""
{derived.with_ctes('boxes', 'query_boxes')}
SELECT q.qid AS qid, {_BOX_OUT}
FROM query_boxes q
JOIN boxes b
  ON b.min_x <= q.min_x AND q.max_x <= b.max_x
 AND b.min_y <= q.min_y AND q.max_y <= b.max_y
"""


@register("r_find_supersets", _SUPERSETS_ORACLE)
def r_find_supersets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 find_supersets_items (/root/reference/locus/r.py:307-353)."""
    b = derived.load(spark, sf_dir, "boxes")
    q = derived.load(spark, sf_dir, "query_boxes")
    return find_supersets_join(b, q, grid=WORLD_GRID)


def _knn_oracle(
    data: str,
    probe: str,
    out_cols: str,
    dist2: str,
    k: int,
    tie: str = "id",
    rn: bool = True,
) -> str:
    return f"""
{derived.with_ctes(data, probe)}
, cand AS (
  SELECT q.qid AS qid, {out_cols}, {dist2} AS dist2
  FROM {probe} q CROSS JOIN {data} b
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, {tie}) AS rn
  FROM cand
)
SELECT * {'' if rn else 'EXCLUDE (rn)'}
FROM ranked WHERE rn <= {k}
"""


_D2_PB = sql_dist2_point_box("q.x", "q.y", "b.min_x", "b.max_x", "b.min_y", "b.max_y")


@register(
    "r_knn",
    _knn_oracle("boxes", "query_points", _BOX_OUT, _D2_PB, KNN_K, tie="id DESC"),
)
def r_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 n_nearest_items (/root/reference/locus/r.py:453-498); ties → larger id."""
    b = derived.load(spark, sf_dir, "boxes")
    qp = derived.load(spark, sf_dir, "query_points")
    return box_knn_join(b, qp, KNN_K, grid=WORLD_GRID)


@register(
    "r_nearest",
    _knn_oracle("boxes", "query_points", _BOX_OUT, _D2_PB, 1, tie="id DESC", rn=False),
)
def r_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 nearest_item (/root/reference/locus/r.py:557-611)."""
    b = derived.load(spark, sf_dir, "boxes")
    qp = derived.load(spark, sf_dir, "query_points")
    return box_nearest_join(b, qp, grid=WORLD_GRID)


# ===========================================================================
# segmental-family queries (SURVEY.md §2.4)
# ===========================================================================

_SEG_OUT = "b.id AS id, b.x1 AS x1, b.y1 AS y1, b.x2 AS x2, b.y2 AS y2"
_D2_PS = sql_dist2_point_segment("q.x", "q.y", "b.x1", "b.y1", "b.x2", "b.y2")
_D2_SS = sql_dist2_segment_segment(
    "q.x1", "q.y1", "q.x2", "q.y2", "b.x1", "b.y1", "b.x2", "b.y2"
)


@register(
    "seg_knn_to_point",
    _knn_oracle("segments", "query_points", _SEG_OUT, _D2_PS, KNN_K),
)
def seg_knn_to_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 n_nearest_to_point_items (/root/reference/locus/segmental.py:341-392)."""
    s = derived.load(spark, sf_dir, "segments")
    qp = derived.load(spark, sf_dir, "query_points")
    return segment_knn_to_point_join(s, qp, KNN_K, grid=WORLD_GRID)


@register(
    "seg_nearest_to_point",
    _knn_oracle("segments", "query_points", _SEG_OUT, _D2_PS, 1, rn=False),
)
def seg_nearest_to_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 nearest_to_point_item (/root/reference/locus/segmental.py:599-653)."""
    s = derived.load(spark, sf_dir, "segments")
    qp = derived.load(spark, sf_dir, "query_points")
    return segment_nearest_to_point_join(s, qp, grid=WORLD_GRID)


@register(
    "seg_knn",
    _knn_oracle("segments", "query_segments", _SEG_OUT, _D2_SS, KNN_K),
)
def seg_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 n_nearest_items, segment→segment (/root/reference/locus/segmental.py:192-243)."""
    s = derived.load(spark, sf_dir, "segments")
    qs = derived.load(spark, sf_dir, "query_segments")
    return segment_knn_join(s, qs, KNN_K, grid=WORLD_GRID)
