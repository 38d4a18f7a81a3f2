"""Extract catalog: the engine's analog of the reference's ``CutInfo``
registry (reference ``cut.hpp:11-118``, built by ``readConfig`` at
``splitter.cpp:101-184``).

An extract is an output region: name + predicate geometry. The catalog is
driver-side (10s..1000s of extracts), broadcast into joins — never shuffled.
Each extract also gets a grid cell cover (see ``functions.grid``) at a
per-extract resolution; the cover is the broadcast spatial index replacing
the reference's per-extract GEOS ``IndexedPointInAreaLocator``
(``cut.hpp:111``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions import grid
from ..functions.geometry import close_ring, rings_bbox
from ..model import EXTRACT_SCHEMA

__all__ = ["Extract", "ExtractCatalog"]


@dataclass
class Extract:
    name: str
    kind: str  # 'BBOX' | 'POLY' | 'OSM'
    minlon: float
    minlat: float
    maxlon: float
    maxlat: float
    rings: list[np.ndarray] | None = None  # closed rings, lon/lat
    #: per-ring hole flag (.poly '!'-sections). None → even-odd parity
    #: across rings; flags → reference GEOS-union composition (outers
    #: OR-ed, holes subtracted — geometryreader.hpp:256-274).
    holes: list[bool] | None = None

    @classmethod
    def bbox(cls, name: str, minlon: float, minlat: float, maxlon: float, maxlat: float) -> "Extract":
        return cls(name, "BBOX", minlon, minlat, maxlon, maxlat)

    @classmethod
    def poly(
        cls, name: str, rings: list, kind: str = "POLY",
        holes: list[bool] | None = None,
    ) -> "Extract":
        rings = [close_ring(np.asarray(r, dtype=np.float64)) for r in rings]
        minlon, minlat, maxlon, maxlat = rings_bbox(rings)
        if holes is not None and len(holes) != len(rings):
            raise ValueError(
                f"{name}: {len(holes)} hole flags for {len(rings)} rings"
            )
        return cls(name, kind, minlon, minlat, maxlon, maxlat, rings, holes)


@dataclass
class ExtractCatalog:
    extracts: list[Extract] = field(default_factory=list)
    max_cover_cells: int = 4096
    #: budget for the TOTAL broadcast cover (all extracts): ~2M rows ≈
    #: 60 MB broadcast. A 10^5-extract tile grid at 4096 cells each would
    #: otherwise build a 4*10^8-row "broadcast" — cover_rows() degrades
    #: per-extract resolution uniformly until the total fits (coarser
    #: cover = more exact-refine work per boundary cell, never wrong).
    max_total_cover_cells: int = 2_000_000
    #: H3-``compact``-style interior merge depth (``grid.compact_cover``):
    #: 0 = single-resolution covers (the certified baseline); k > 0 merges
    #: fully-inside 2x2 sibling blocks into parents up to k levels coarser,
    #: shrinking the broadcast index toward O(perimeter) per extract.
    #: Membership is provably unchanged (area-identical multi-res cover);
    #: the join runs one ladder rung per distinct resolution instead.
    compact_levels: int = 0

    def add(self, e: Extract) -> "ExtractCatalog":
        self.extracts.append(e)
        return self

    def __iter__(self):
        return iter(self.extracts)

    def __len__(self):
        return len(self.extracts)

    def fingerprint(self) -> str:
        """sha256 over the MEMBERSHIP-RELEVANT definition of every
        extract — name, kind, bbox, rings, hole flags — so checkpointed
        marker stages can be tied to the catalog that produced them.
        ``incremental_resplit`` refuses signature-based marker reuse
        when this differs between ticks: an edited config/.poly changes
        every id's membership without changing a single world row, which
        a world-only signature can never see. Cover tuning knobs
        (resolutions, compaction) are deliberately EXCLUDED — they change
        the candidate index, never the final membership."""
        import hashlib

        h = hashlib.sha256()
        for e in sorted(self.extracts, key=lambda x: x.name):
            h.update(e.name.encode())
            h.update(b"\x00")
            h.update(e.kind.encode())
            h.update(
                np.asarray(
                    [e.minlon, e.minlat, e.maxlon, e.maxlat],
                    dtype=np.float64,
                ).tobytes()
            )
            for r in e.rings or []:
                arr = np.asarray(r, dtype=np.float64)
                h.update(str(arr.shape).encode())
                h.update(arr.tobytes())
            h.update(bytes(bool(x) for x in (e.holes or [])))
            h.update(b"\x01")
        return h.hexdigest()

    # -- driver-side tables ------------------------------------------------

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                e.name,
                e.kind,
                float(e.minlon),
                float(e.minlat),
                float(e.maxlon),
                float(e.maxlat),
                None if e.rings is None else [[list(map(float, p)) for p in r] for r in e.rings],
            )
            for e in self.extracts
        ]
        return spark.createDataFrame(rows, schema=EXTRACT_SCHEMA)

    def resolutions(self, per_extract_cap: int | None = None) -> dict[str, int]:
        """Per-extract grid resolution bounded by the per-extract cap."""
        cap = per_extract_cap or self._fitted_cap()
        return {
            e.name: grid.pick_res(e.minlon, e.minlat, e.maxlon, e.maxlat, cap)
            for e in self.extracts
        }

    def _fitted_cap(self) -> int:
        """Largest per-extract cell cap (<= max_cover_cells) whose TOTAL
        cover fits max_total_cover_cells. Estimates each extract's cover by
        its bbox cell count at the capped resolution (an upper bound for
        bboxes, close for polygons) — driver-side arithmetic only, no cover
        is actually built while fitting."""
        cap = self.max_cover_cells
        while cap > 16:
            total = 0
            for e in self.extracts:
                res = grid.pick_res(e.minlon, e.minlat, e.maxlon, e.maxlat, cap)
                w = grid.cell_width(res)
                nx = int((e.maxlon - e.minlon) / w) + 2
                ny = int((e.maxlat - e.minlat) / w) + 2
                total += nx * ny
            if total <= self.max_total_cover_cells:
                break
            cap //= 4  # one resolution level coarser
        return cap

    def cover_rows(self) -> list[tuple]:
        """(extract, res, cell, fully_inside, kind, bbox…) for every covered
        cell of every extract — the broadcastable spatial index. Carrying
        kind+bbox as columns keeps the refine predicate constant-size no
        matter how many extracts the catalog holds (vs an OR-chain per
        extract, which would blow up the plan for tile grids)."""
        out = []
        res_by_name = self.resolutions()
        for e in self.extracts:
            res = res_by_name[e.name]
            if e.kind == "BBOX":
                cells, fully = grid.cover_bbox(
                    e.minlon, e.minlat, e.maxlon, e.maxlat, res
                )
            else:
                cells, fully = grid.cover_rings(e.rings, res, holes=e.holes)
            if self.compact_levels > 0:
                leveled = grid.compact_cover(
                    cells, fully, res, levels=self.compact_levels
                )
            else:
                leveled = [(res, cells, fully)]
            for lr, lc, lf in leveled:
                out.extend(
                    (
                        e.name, lr, int(c), bool(f), e.kind,
                        float(e.minlon), float(e.minlat),
                        float(e.maxlon), float(e.maxlat),
                    )
                    for c, f in zip(lc, lf)
                )
        return out

    def cover_df(
        self, spark: SparkSession, _rows: list[tuple] | None = None
    ) -> DataFrame:
        """Cover rows as a broadcastable DataFrame. ``_rows`` lets a caller
        that already materialized :meth:`cover_rows` (to inspect the
        resolution set) avoid rebuilding every cover."""
        schema = T.StructType(
            [
                T.StructField("extract", T.StringType(), False),
                T.StructField("res", T.IntegerType(), False),
                T.StructField("cell", T.LongType(), False),
                T.StructField("fully_inside", T.BooleanType(), False),
                T.StructField("kind", T.StringType(), False),
                T.StructField("minlon", T.DoubleType(), False),
                T.StructField("minlat", T.DoubleType(), False),
                T.StructField("maxlon", T.DoubleType(), False),
                T.StructField("maxlat", T.DoubleType(), False),
            ]
        )
        return spark.createDataFrame(
            self.cover_rows() if _rows is None else _rows, schema=schema
        )

    # -- geometry payload for the refine UDF -------------------------------

    def rings_payload(self) -> dict[str, list]:
        """{extract -> list of rings as nested float lists} for pickling into
        the exact-PIP pandas UDF closure (or an explicit sc.broadcast)."""
        return {
            e.name: [np.asarray(r, dtype=np.float64) for r in e.rings]
            for e in self.extracts
            if e.rings is not None
        }

    def holes_payload(self) -> dict[str, list]:
        """{extract -> per-ring hole flags}, only for extracts that carry
        them — companion of :meth:`rings_payload` for the refine UDF."""
        return {
            e.name: list(e.holes)
            for e in self.extracts
            if e.rings is not None and e.holes is not None
        }

    def bbox_payload(self) -> dict[str, tuple]:
        return {
            e.name: (e.minlon, e.minlat, e.maxlon, e.maxlat)
            for e in self.extracts
        }

    def centroids(self) -> dict[str, tuple]:
        """Extract centroid (bbox center) for kNN-to-centroid queries."""
        return {
            e.name: ((e.minlon + e.maxlon) / 2.0, (e.minlat + e.maxlat) / 2.0)
            for e in self.extracts
        }
