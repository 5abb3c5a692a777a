"""User-facing index classes mirroring the reference's three Tree APIs —
``locus/kd.py:19-25`` (kd.Tree), ``locus/r.py:21-27`` (r.Tree),
``locus/segmental.py:18-24`` (segmental.Tree) — including every projection
method (indices/geometries/items forms) and the introspection properties
(``points``/``boxes``/``segments``, ``context``, ``max_children``:
``locus/kd.py:59-91``, ``locus/r.py:64-118``, ``locus/segmental.py:81-141``).

A "Tree" here is a DataFrame plus a :class:`GridSpec` — build-once means
deriving (or being given) the grid; queries are the distributed joins of
``operators/``.  The reference's ``max_children`` packing knob
(``locus/r.py:37``, tested across 2..65535 at
``tests/r_tests/strategies.py:17-19``) maps to ``target_occupancy``: the mean
rows-per-cell the auto-sized grid aims for (``cells.resolution_for``) —
both control the fan-out bound of a single index node/cell.

Projection methods are thin ``select``s over the items-form join — exactly
how the reference implements them (``nearest_index`` delegates to the item
search, ``locus/kd.py:255-286``)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from locus_spark.cells import (
    TARGET_CELL_OCCUPANCY,
    GridSpec,
    grid_from_boxes,
    grid_from_points,
)
from locus_spark.operators import boxes as _b
from locus_spark.operators import points as _p
from locus_spark.operators import segments as _s

BOX_GEOM = ["min_x", "max_x", "min_y", "max_y"]
SEG_GEOM = ["x1", "y1", "x2", "y2"]


@dataclass(frozen=True)
class PointIndex:
    """kd.Tree analogue (``/root/reference/locus/kd.py:29-55``): points
    table ``(id, x, y)`` + grid.  ``grid=None`` auto-sizes the resolution
    from the row count so mean cell occupancy ≈ ``max_children``."""

    data: DataFrame
    grid: GridSpec | None = None
    target_occupancy: int = TARGET_CELL_OCCUPANCY
    _grid: GridSpec = field(init=False, repr=False)

    def __post_init__(self) -> None:
        g = self.grid or grid_from_points(
            self.data, resolution=None, target=self.target_occupancy
        )
        object.__setattr__(self, "_grid", g)

    # -- props (K10; locus/kd.py:59-91) ------------------------------------
    @property
    def points(self) -> DataFrame:
        return self.data

    @property
    def context(self) -> GridSpec:
        return self._grid

    @property
    def max_children(self) -> int:
        return self.target_occupancy

    # -- queries (K1-K9, K11) ----------------------------------------------
    def nearest_item(self, probes: DataFrame) -> DataFrame:
        return _p.nearest_join(self.data, probes, grid=self._grid)

    def nearest_index(self, probes: DataFrame) -> DataFrame:
        """K2 (locus/kd.py:255-286): (qid, id)."""
        return self.nearest_item(probes).select("qid", "id")

    def nearest_point(self, probes: DataFrame) -> DataFrame:
        """K3 (locus/kd.py:288-318): (qid, x, y)."""
        return self.nearest_item(probes).select("qid", "x", "y")

    def n_nearest_items(self, probes: DataFrame, n: int) -> DataFrame:
        return _p.knn_join(self.data, probes, n, grid=self._grid)

    def n_nearest_indices(self, probes: DataFrame, n: int) -> DataFrame:
        """K5 (locus/kd.py:93-133): (qid, id, rn)."""
        return self.n_nearest_items(probes, n).select("qid", "id", "rn")

    def n_nearest_points(self, probes: DataFrame, n: int) -> DataFrame:
        """K6 (locus/kd.py:135-174): (qid, x, y, rn)."""
        return self.n_nearest_items(probes, n).select("qid", "x", "y", "rn")

    def find_box_items(self, query_boxes: DataFrame) -> DataFrame:
        return _p.find_box_join(self.data, query_boxes, grid=self._grid)

    def find_box_indices(self, query_boxes: DataFrame) -> DataFrame:
        """K8 (locus/kd.py:376-408): (qid, id)."""
        return self.find_box_items(query_boxes).select("qid", "id")

    def find_box_points(self, query_boxes: DataFrame) -> DataFrame:
        """K9 (locus/kd.py:410-447): (qid, x, y)."""
        return self.find_box_items(query_boxes).select("qid", "x", "y")

    def find_ball_items(self, query_circles: DataFrame) -> DataFrame:
        """K11 (pre-v5 find_ball; tests/kd_tests/strategies.py:71-90)."""
        return _p.find_ball_join(self.data, query_circles, grid=self._grid)


@dataclass(frozen=True)
class BoxIndex:
    """r.Tree analogue (``/root/reference/locus/r.py:31-60``): boxes table
    ``(id, min_x, max_x, min_y, max_y)`` + grid; ties break to LARGER id
    (``locus/r.py:599-606``)."""

    data: DataFrame
    grid: GridSpec | None = None
    target_occupancy: int = TARGET_CELL_OCCUPANCY
    _grid: GridSpec = field(init=False, repr=False)

    def __post_init__(self) -> None:
        g = self.grid or grid_from_boxes(self.data)
        object.__setattr__(self, "_grid", g)

    # -- props (R11; locus/r.py:64-118) ------------------------------------
    @property
    def boxes(self) -> DataFrame:
        return self.data

    @property
    def context(self) -> GridSpec:
        return self._grid

    @property
    def max_children(self) -> int:
        return self.target_occupancy

    # -- queries (R1-R10) ---------------------------------------------------
    def find_subsets_items(self, query_boxes: DataFrame) -> DataFrame:
        return _b.find_subsets_join(self.data, query_boxes, grid=self._grid)

    def find_subsets_indices(self, query_boxes: DataFrame) -> DataFrame:
        """R2 (locus/r.py:158-188): (qid, id)."""
        return self.find_subsets_items(query_boxes).select("qid", "id")

    def find_subsets(self, query_boxes: DataFrame) -> DataFrame:
        """R3 (locus/r.py:120-156): (qid, box geometry)."""
        return self.find_subsets_items(query_boxes).select("qid", *BOX_GEOM)

    def find_supersets_items(self, query_boxes: DataFrame) -> DataFrame:
        return _b.find_supersets_join(self.data, query_boxes, grid=self._grid)

    def find_supersets_indices(self, query_boxes: DataFrame) -> DataFrame:
        """R5 (locus/r.py:275-305)."""
        return self.find_supersets_items(query_boxes).select("qid", "id")

    def find_supersets(self, query_boxes: DataFrame) -> DataFrame:
        """R6 (locus/r.py:237-273)."""
        return self.find_supersets_items(query_boxes).select("qid", *BOX_GEOM)

    def nearest_item(self, probes: DataFrame) -> DataFrame:
        return _b.box_nearest_join(self.data, probes, grid=self._grid)

    def nearest_index(self, probes: DataFrame) -> DataFrame:
        """R8 (locus/r.py:500-527)."""
        return self.nearest_item(probes).select("qid", "id")

    def nearest_box(self, probes: DataFrame) -> DataFrame:
        """R8 (locus/r.py:529-555)."""
        return self.nearest_item(probes).select("qid", *BOX_GEOM)

    def n_nearest_items(self, probes: DataFrame, n: int) -> DataFrame:
        return _b.box_knn_join(self.data, probes, n, grid=self._grid)

    def n_nearest_indices(self, probes: DataFrame, n: int) -> DataFrame:
        """R10 (locus/r.py:369-410)."""
        return self.n_nearest_items(probes, n).select("qid", "id", "rn")

    def n_nearest_boxes(self, probes: DataFrame, n: int) -> DataFrame:
        """R10 (locus/r.py:412-451)."""
        return self.n_nearest_items(probes, n).select("qid", *BOX_GEOM, "rn")


@dataclass(frozen=True)
class SegmentIndex:
    """segmental.Tree analogue (``/root/reference/locus/segmental.py:28-77``):
    segments table ``(id, x1, y1, x2, y2)`` + grid; ties break to SMALLER id
    (``locus/segmental.py:516-528``)."""

    data: DataFrame
    grid: GridSpec | None = None
    target_occupancy: int = TARGET_CELL_OCCUPANCY
    _grid: GridSpec = field(init=False, repr=False)

    def __post_init__(self) -> None:
        g = self.grid or _s.grid_from_segments(self.data)
        object.__setattr__(self, "_grid", g)

    # -- props (S9; locus/segmental.py:81-141) ------------------------------
    @property
    def segments(self) -> DataFrame:
        return self.data

    @property
    def context(self) -> GridSpec:
        return self._grid

    @property
    def max_children(self) -> int:
        return self.target_occupancy

    # -- queries (S1-S8) -----------------------------------------------------
    def nearest_item(self, probe_segments: DataFrame) -> DataFrame:
        return _s.segment_nearest_join(self.data, probe_segments, grid=self._grid)

    def nearest_index(self, probe_segments: DataFrame) -> DataFrame:
        """S2 (locus/segmental.py:444-475)."""
        return self.nearest_item(probe_segments).select("qid", "id")

    def nearest_segment(self, probe_segments: DataFrame) -> DataFrame:
        """S2 (locus/segmental.py:531-565)."""
        return self.nearest_item(probe_segments).select("qid", *SEG_GEOM)

    def nearest_to_point_item(self, probes: DataFrame) -> DataFrame:
        return _s.segment_nearest_to_point_join(self.data, probes, grid=self._grid)

    def nearest_to_point_index(self, probes: DataFrame) -> DataFrame:
        """S4 (locus/segmental.py:567-597)."""
        return self.nearest_to_point_item(probes).select("qid", "id")

    def nearest_to_point_segment(self, probes: DataFrame) -> DataFrame:
        """S4 (locus/segmental.py:655-689)."""
        return self.nearest_to_point_item(probes).select("qid", *SEG_GEOM)

    def n_nearest_items(self, probe_segments: DataFrame, n: int) -> DataFrame:
        return _s.segment_knn_join(self.data, probe_segments, n, grid=self._grid)

    def n_nearest_indices(self, probe_segments: DataFrame, n: int) -> DataFrame:
        """S6 (locus/segmental.py:143-190)."""
        return self.n_nearest_items(probe_segments, n).select("qid", "id", "rn")

    def n_nearest_segments(self, probe_segments: DataFrame, n: int) -> DataFrame:
        """S6 (locus/segmental.py:245-293)."""
        return self.n_nearest_items(probe_segments, n).select("qid", *SEG_GEOM, "rn")

    def n_nearest_to_point_items(self, probes: DataFrame, n: int) -> DataFrame:
        return _s.segment_knn_to_point_join(self.data, probes, n, grid=self._grid)

    def n_nearest_to_point_indices(self, probes: DataFrame, n: int) -> DataFrame:
        """S8 (locus/segmental.py:295-339)."""
        return self.n_nearest_to_point_items(probes, n).select("qid", "id", "rn")

    def n_nearest_to_point_segments(self, probes: DataFrame, n: int) -> DataFrame:
        """S8 (locus/segmental.py:394-442)."""
        return self.n_nearest_to_point_items(probes, n).select("qid", *SEG_GEOM, "rn")
