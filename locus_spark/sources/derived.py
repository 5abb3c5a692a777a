"""Derived geometry tables over the driver's TPC-H-ish parquet.

The reference indexes ``Sequence[Point]`` / ``Sequence[Box]`` /
``Sequence[Segment]`` (``/root/reference/locus/kd.py:31``, ``locus/r.py:33``,
``locus/segmental.py:30``).  Here geometry is *derived deterministically* from
the testdata tables with pure integer arithmetic + IEEE-754 float64 ops so the
Spark engine and the DuckDB oracle compute bit-identical coordinates — no
hash builtins (Spark's xxhash64 and DuckDB's hash disagree), no libm calls
(sin/cos may differ by ULPs across implementations).

Every derivation below is a single SQL text used BOTH as a Spark temp view
and as a CTE inside the DuckDB oracle query.  Only common-dialect SQL:
``* % /`` on BIGINT (exact below 2^63), ``/ <double>`` (correctly-rounded
IEEE division in both engines), ``+ - *`` on DOUBLE.

The multipliers are Knuth-style odd constants; the moduli are primes, so the
derived coordinates scatter over the plane (a stand-in for the geocoded
web-page points of the production pipeline — see locus_spark/geocode.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# ---------------------------------------------------------------------------
# data-side geometry
# ---------------------------------------------------------------------------

#: points(id, x, y) — one point per customer, scattered over [-180,180]x[-90,90]
POINTS_SQL = """
SELECT c_custkey AS id,
       ((c_custkey * 2654435761) % 1000003) / 1000003.0e0 * 360.0e0 - 180.0e0 AS x,
       ((c_custkey * 2246822519) % 999983) / 999983.0e0 * 180.0e0 - 90.0e0 AS y
FROM customer
"""

#: boxes(id, min_x, max_x, min_y, max_y) — one box per order; never degenerate
#: (width/height >= ~0.036), matching the reference generators
#: (/root/reference/tests/strategies/base.py:88-99 build boxes from two
#: distinct sorted scalars per axis).
BOXES_SQL = """
SELECT o_orderkey AS id,
       ((o_orderkey * 2654435761) % 1000003) / 1000003.0e0 * 340.0e0 - 170.0e0
         - (((o_orderkey * 40503) % 997) / 997.0e0 * 9.0e0 + 0.018e0) AS min_x,
       ((o_orderkey * 2654435761) % 1000003) / 1000003.0e0 * 340.0e0 - 170.0e0
         + (((o_orderkey * 40503) % 997) / 997.0e0 * 9.0e0 + 0.018e0) AS max_x,
       ((o_orderkey * 2246822519) % 999983) / 999983.0e0 * 160.0e0 - 80.0e0
         - (((o_orderkey * 68857) % 991) / 991.0e0 * 4.5e0 + 0.018e0) AS min_y,
       ((o_orderkey * 2246822519) % 999983) / 999983.0e0 * 160.0e0 - 80.0e0
         + (((o_orderkey * 68857) % 991) / 991.0e0 * 4.5e0 + 0.018e0) AS max_y
FROM orders
"""

#: segments(id, x1, y1, x2, y2) — one segment per distinct (orderkey,
#: linenumber) pair (the synthetic lineitem contains duplicate pairs, so
#: DISTINCT keeps ids unique — the reference's positional index is unique
#: even for duplicate geometries, /root/reference/locus/_core/kd.py:12);
#: endpoints
#: distinct by construction (offsets are bounded away from zero), matching
#: /root/reference/tests/strategies/base.py:80-85.
SEGMENTS_SQL = """
SELECT DISTINCT l_orderkey * 8 + l_linenumber AS id,
       (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000003) / 1000003.0e0 * 350.0e0 - 175.0e0 AS x1,
       (((l_orderkey * 8 + l_linenumber) * 2246822519) % 999983) / 999983.0e0 * 170.0e0 - 85.0e0 AS y1,
       (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000003) / 1000003.0e0 * 350.0e0 - 175.0e0
         + (((l_orderkey * 8 + l_linenumber) * 40503) % 997) / 997.0e0 * 4.0e0 + 0.01e0 AS x2,
       (((l_orderkey * 8 + l_linenumber) * 2246822519) % 999983) / 999983.0e0 * 170.0e0 - 85.0e0
         + (((l_orderkey * 8 + l_linenumber) * 68857) % 991) / 991.0e0 * 4.0e0 + 0.01e0 AS y2
FROM lineitem
"""

# ---------------------------------------------------------------------------
# probe-side geometry (small tables — broadcastable query sides)
# ---------------------------------------------------------------------------

#: query_points(qid, x, y) — one probe per supplier (100 @ sf0.01)
QUERY_POINTS_SQL = """
SELECT s_suppkey AS qid,
       ((s_suppkey * 1803392633) % 1000003) / 1000003.0e0 * 360.0e0 - 180.0e0 AS x,
       ((s_suppkey * 2971215073) % 999983) / 999983.0e0 * 180.0e0 - 90.0e0 AS y
FROM supplier
"""

#: query_boxes(qid, min_x, max_x, min_y, max_y) — one probe box per nation (25)
QUERY_BOXES_SQL = """
SELECT n_nationkey AS qid,
       ((CAST(n_nationkey AS BIGINT) * 1803392633) % 1000003) / 1000003.0e0 * 300.0e0 - 150.0e0
         - (((CAST(n_nationkey AS BIGINT) * 40503) % 97) / 97.0e0 * 25.0e0 + 1.0e0) AS min_x,
       ((CAST(n_nationkey AS BIGINT) * 1803392633) % 1000003) / 1000003.0e0 * 300.0e0 - 150.0e0
         + (((CAST(n_nationkey AS BIGINT) * 40503) % 97) / 97.0e0 * 25.0e0 + 1.0e0) AS max_x,
       ((CAST(n_nationkey AS BIGINT) * 2971215073) % 999983) / 999983.0e0 * 140.0e0 - 70.0e0
         - (((CAST(n_nationkey AS BIGINT) * 68857) % 89) / 89.0e0 * 12.0e0 + 1.0e0) AS min_y,
       ((CAST(n_nationkey AS BIGINT) * 2971215073) % 999983) / 999983.0e0 * 140.0e0 - 70.0e0
         + (((CAST(n_nationkey AS BIGINT) * 68857) % 89) / 89.0e0 * 12.0e0 + 1.0e0) AS max_y
FROM nation
"""

#: query_circles(qid, x, y, r) — ball-search probes (radius = abs-scaled
#: scalar, the vestigial find_ball strategy:
#: /root/reference/tests/kd_tests/strategies.py:71-90)
QUERY_CIRCLES_SQL = """
SELECT s_suppkey AS qid,
       ((s_suppkey * 1803392633) % 1000003) / 1000003.0e0 * 360.0e0 - 180.0e0 AS x,
       ((s_suppkey * 2971215073) % 999983) / 999983.0e0 * 180.0e0 - 90.0e0 AS y,
       ((s_suppkey * 40503) % 997) / 997.0e0 * 15.0e0 + 0.5e0 AS r
FROM supplier
"""

#: query_segments(qid, x1, y1, x2, y2) — segment probes, one per supplier
QUERY_SEGMENTS_SQL = """
SELECT s_suppkey AS qid,
       ((s_suppkey * 1803392633) % 1000003) / 1000003.0e0 * 350.0e0 - 175.0e0 AS x1,
       ((s_suppkey * 2971215073) % 999983) / 999983.0e0 * 170.0e0 - 85.0e0 AS y1,
       ((s_suppkey * 1803392633) % 1000003) / 1000003.0e0 * 350.0e0 - 175.0e0
         + ((s_suppkey * 40503) % 997) / 997.0e0 * 6.0e0 + 0.01e0 AS x2,
       ((s_suppkey * 2971215073) % 999983) / 999983.0e0 * 170.0e0 - 85.0e0
         + ((s_suppkey * 68857) % 991) / 991.0e0 * 6.0e0 + 0.01e0 AS y2
FROM supplier
"""

DERIVED = {
    "points": POINTS_SQL,
    "boxes": BOXES_SQL,
    "segments": SEGMENTS_SQL,
    "query_points": QUERY_POINTS_SQL,
    "query_boxes": QUERY_BOXES_SQL,
    "query_circles": QUERY_CIRCLES_SQL,
    "query_segments": QUERY_SEGMENTS_SQL,
}


#: session conf key recording which sf_dir's views are currently registered.
#: Stored on the session itself (not a module dict keyed by a GC-able proxy
#: id), so a fresh session always registers and switching dirs re-registers —
#: the views are overwrite-in-place, so only the *latest* dir is valid.
_REGISTERED_CONF_KEY = "locus_spark.registered_sf_dir"


def register_base_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views (memoized per
    session — every registry query calls this, and re-reading 10 parquet
    footers per query is pure overhead).  Re-registers whenever the requested
    dir differs from the one the session currently has."""
    if spark.conf.get(_REGISTERED_CONF_KEY, None) == sf_dir:
        return
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    spark.conf.set(_REGISTERED_CONF_KEY, sf_dir)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Derived geometry DataFrame (registers base views as a side effect)."""
    register_base_tables(spark, sf_dir)
    return spark.sql(DERIVED[name])


def with_ctes(*names: str) -> str:
    """``WITH points AS (...), ...`` prefix for oracle SQL, using the exact
    same derivation text the Spark side ran."""
    parts = ", ".join(f"{n} AS ({DERIVED[n]})" for n in names)
    return f"WITH {parts}"
