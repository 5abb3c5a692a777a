"""Point queries as distributed joins (SURVEY.md §2.2, K1-K11).

The reference answers these with kd-tree traversals
(``/root/reference/locus/kd.py``): range search ``find_box_items``
(``kd.py:449-507``), nearest ``nearest_item`` (``kd.py:320-374``), k-NN
``n_nearest_items`` (``kd.py:176-253``), plus the vestigial ball search
(``tests/kd_tests/strategies.py:71-90``).  Here the probe side is a *table*,
so each query family becomes a join:

* range / ball → covering-cell equi-join + exact closed predicate
  (cell pruning plays the role of tree descent; the exact predicate at the
  end means pruning can never lose rows — safe-superset, SURVEY.md §4 O10);
* nearest / k-NN → iterative **cell-ring expansion**: join probes against
  points in Chebyshev-ring annuli of cells, keep a running per-probe top-k,
  stop a probe once its k-th best squared distance is ≤ the squared distance
  to the nearest *uncovered* region (the distributed analogue of the kd
  branch-and-bound prune, ``kd.py:368``, and of the R-tree best-first
  frontier, ``r.py:592-610``).

All distance math is native Column expressions (whole-stage codegen).  The
driver-side loop only synchronizes ring rounds — every round is a fully
distributed broadcast join + window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from locus_spark.cells import GridSpec, grid_from_points
from locus_spark.functions.metrics import dist2_point_point

RESULT_COLS = ("qid", "id", "x", "y", "dist2")


def find_box_join(
    points: DataFrame,
    query_boxes: DataFrame,
    grid: GridSpec | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """All (probe box, point) pairs with the point inside the closed box —
    table form of ``find_box_items`` (``/root/reference/locus/kd.py:449-507``;
    closed predicate ``_core/box.py:6-9``).

    Returns ``(qid, id, x, y)``.  The covering-cell equi-join prunes like the
    kd descent; the final ``between`` conjunction is the exact predicate.
    """
    if grid is None:
        grid = grid_from_points(points)
    pts = points.withColumn("_cell", grid.cell_col(F.col("x"), F.col("y")))
    qcells = grid.explode_covering(
        query_boxes, "min_x", "max_x", "min_y", "max_y", cell_name="_cell"
    )
    if broadcast_queries:
        qcells = F.broadcast(qcells)
    joined = qcells.join(pts, "_cell")
    exact = joined.filter(
        F.col("x").between(F.col("min_x"), F.col("max_x"))
        & F.col("y").between(F.col("min_y"), F.col("max_y"))
    )
    return exact.select("qid", "id", "x", "y")


def find_ball_join(
    points: DataFrame,
    query_circles: DataFrame,
    grid: GridSpec | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Ball (radius) search: all (probe, point) with dist²(point, center) ≤ r²
    — the pre-v5 ``find_ball`` mandated by the north rule (vestigial strategy
    at ``/root/reference/tests/kd_tests/strategies.py:71-90``; metric of
    ``locus/kd.py:53``).

    Returns ``(qid, id, x, y, dist2)``.  Cell prefilter = circumscribed box.
    """
    if grid is None:
        grid = grid_from_points(points)
    pts = points.withColumn("_cell", grid.cell_col(F.col("x"), F.col("y")))
    qboxes = query_circles.select(
        "qid",
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        F.col("r").alias("_r"),
        (F.col("x") - F.col("r")).alias("_bmin_x"),
        (F.col("x") + F.col("r")).alias("_bmax_x"),
        (F.col("y") - F.col("r")).alias("_bmin_y"),
        (F.col("y") + F.col("r")).alias("_bmax_y"),
    )
    qcells = grid.explode_covering(
        qboxes, "_bmin_x", "_bmax_x", "_bmin_y", "_bmax_y", cell_name="_cell"
    )
    if broadcast_queries:
        qcells = F.broadcast(qcells)
    joined = qcells.join(pts, "_cell")
    d2 = dist2_point_point(F.col("x"), F.col("y"), F.col("_qx"), F.col("_qy"))
    return (
        joined.withColumn("dist2", d2)
        .filter(F.col("dist2") <= F.col("_r") * F.col("_r"))
        .select("qid", "id", "x", "y", "dist2")
    )


def _annulus_cells(
    probes: DataFrame, grid: GridSpec, lo: int, hi: int
) -> DataFrame:
    """One row per (probe, cell) for cells at Chebyshev distance in [lo, hi]
    from the probe's cell, clipped to the grid."""
    n = grid.n
    cx0 = F.greatest(F.lit(0), F.col("_pcx") - F.lit(hi))
    cx1 = F.least(F.lit(n - 1), F.col("_pcx") + F.lit(hi))
    cy0 = F.greatest(F.lit(0), F.col("_pcy") - F.lit(hi))
    cy1 = F.least(F.lit(n - 1), F.col("_pcy") + F.lit(hi))
    out = (
        probes.withColumn("_cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("_cy", F.explode(F.sequence(cy0, cy1)))
    )
    if lo > 0:
        cheb = F.greatest(
            F.abs(F.col("_cx") - F.col("_pcx")), F.abs(F.col("_cy") - F.col("_pcy"))
        )
        out = out.filter(cheb >= F.lit(lo))
    return out


def knn_join(
    points: DataFrame,
    probes: DataFrame,
    k: int,
    grid: GridSpec | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """Exact k-nearest-neighbor join: for each probe point, the k indexed
    points with smallest squared distance, ties by ascending id.

    Table form of ``n_nearest_items`` (``/root/reference/locus/kd.py:176-253``;
    ``nearest_item`` = k=1, ``kd.py:320-374``).  The reference's bounded
    max-heap + hyperplane prune becomes: per-probe running top-k (window) +
    cell-ring expansion with a distance-to-uncovered-region stopping bound.

    Returns ``(qid, id, x, y, dist2, rn)`` with ``rn`` ∈ [1, k] dense per
    probe (``rn`` cast to long).  Raises ``ValueError`` on empty points —
    the reference does too (``kd.py:350-351``).
    """
    if k < 1:
        raise ValueError("knn_join: k must be >= 1")
    n_points = points.count()
    if n_points == 0:
        raise ValueError("knn_join: empty points input")
    if grid is None:
        grid = grid_from_points(points)

    w = Window.partitionBy("qid").orderBy("dist2", "id")
    d2 = dist2_point_point(F.col("x"), F.col("y"), F.col("_qx"), F.col("_qy"))

    if k >= n_points:
        # O3 short-circuit (/root/reference/locus/kd.py:216-220): every point
        # is a neighbor of every probe — skip the ring machinery entirely.
        pr = probes.select(
            "qid", F.col("x").alias("_qx"), F.col("y").alias("_qy")
        )
        all_pairs = F.broadcast(pr).join(points.select("id", "x", "y"))
        return (
            all_pairs.withColumn("dist2", d2)
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .select("qid", "id", "x", "y", "dist2", "rn")
        )

    pts = points.withColumn(
        "_cx", grid.cell_x_col(F.col("x"))
    ).withColumn("_cy", grid.cell_y_col(F.col("y")))

    pr = probes.select(
        "qid",
        F.col("x").alias("_qx"),
        F.col("y").alias("_qy"),
        grid.cell_x_col(F.col("x")).alias("_pcx"),
        grid.cell_y_col(F.col("y")).alias("_pcy"),
    )

    # conservative float-fuzz margin for the settle bound: cell boundaries are
    # computed with floor((v - min)/w), so a point in an "uncovered" cell can
    # sit a few ULPs inside the nominal covered edge — shrink the bound by a
    # relative margin far above ULP scale but far below cell scale.
    scale = max(
        abs(grid.min_x), abs(grid.max_x), abs(grid.min_y), abs(grid.max_y),
        grid.cell_w * grid.n, grid.cell_h * grid.n,
    )
    margin = 1e-9 * scale

    unsettled = pr
    best: DataFrame | None = None
    lo, step = 0, 1
    for _ in range(max_rounds):
        hi = lo + step - 1
        cand = (
            F.broadcast(_annulus_cells(unsettled, grid, lo, hi))
            .join(pts, ["_cx", "_cy"])
            .select("qid", "_qx", "_qy", "_pcx", "_pcy", "id", "x", "y")
            .withColumn("dist2", d2)
        )
        best = cand if best is None else best.unionByName(cand)
        best = (
            best.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
            .localCheckpoint()  # truncate lineage; materialize the round
        )

        # settle test: covered region after ring hi is the cell square
        # [_pcx-hi, _pcx+hi] x [_pcy-hi, _pcy+hi] (clipped). A probe is done
        # when it has k candidates and the k-th distance is within the
        # distance to the nearest uncovered strip (grid sides that are fully
        # covered impose no bound).
        stats = best.groupBy("qid").agg(
            F.count("*").alias("_cnt"), F.max("dist2").alias("_kth")
        )
        n = grid.n
        big = F.lit(float("inf"))
        lx = F.lit(grid.min_x) + (F.col("_pcx") - F.lit(hi)) * F.lit(grid.cell_w)
        rx = F.lit(grid.min_x) + (F.col("_pcx") + F.lit(hi + 1)) * F.lit(grid.cell_w)
        ly = F.lit(grid.min_y) + (F.col("_pcy") - F.lit(hi)) * F.lit(grid.cell_h)
        ty = F.lit(grid.min_y) + (F.col("_pcy") + F.lit(hi + 1)) * F.lit(grid.cell_h)
        exh_l = F.col("_pcx") - F.lit(hi) <= 0
        exh_r = F.col("_pcx") + F.lit(hi) >= n - 1
        exh_b = F.col("_pcy") - F.lit(hi) <= 0
        exh_t = F.col("_pcy") + F.lit(hi) >= n - 1
        gap = F.least(
            F.when(exh_l, big).otherwise(F.col("_qx") - lx),
            F.when(exh_r, big).otherwise(rx - F.col("_qx")),
            F.when(exh_b, big).otherwise(F.col("_qy") - ly),
            F.when(exh_t, big).otherwise(ty - F.col("_qy")),
        )
        bound = F.greatest(F.lit(0.0), gap - F.lit(margin))
        all_exhausted = exh_l & exh_r & exh_b & exh_t
        # NULL stats (probe with no candidates yet) must stay unsettled —
        # coalesce the whole k-th-distance term to false.
        settled = all_exhausted | F.coalesce(
            (F.col("_cnt") >= k) & (F.col("_kth") <= bound * bound), F.lit(False)
        )
        unsettled = (
            unsettled.join(stats, "qid", "left")
            .filter(~settled)
            .select("qid", "_qx", "_qy", "_pcx", "_pcy")
            .localCheckpoint()
        )
        if unsettled.isEmpty():
            break
        lo, step = hi + 1, step * 2  # geometric annuli: few synchronized rounds
    else:
        raise RuntimeError("knn_join: ring expansion did not converge")

    return (
        best.withColumn("rn", F.row_number().over(w).cast("long"))
        .select("qid", "id", "x", "y", "dist2", "rn")
    )


def nearest_join(
    points: DataFrame, probes: DataFrame, grid: GridSpec | None = None
) -> DataFrame:
    """Single-nearest join (``nearest_item``, ``/root/reference/locus/kd.py:320-374``).
    Returns ``(qid, id, x, y, dist2)``."""
    return knn_join(points, probes, 1, grid).drop("rn")
