"""Adaptive quadtree spatial partitioner — balanced partitions under skew.

Hash partitioning scatters spatially-near rows; uniform grids keep them
together but melt under skew (a city-center cell holds 10⁶× the points
of an ocean cell). The standard distributed-spatial answer (the
GeoSpark/Sedona KDB/quadtree partitioners, re-derived for plain
DataFrames) is SAMPLE → driver-side quadtree → explicit curve ranges:

1. sample the point set (bounded rows — cost independent of data size);
2. build a quadtree over the sample: split any quadrant holding more
   than its share until balanced or ``max_depth``;
3. each leaf is an ALIGNED prefix block of the Z-order curve, so the
   leaves form contiguous, non-overlapping, exhaustive curve ranges —
   a row's partition is ``searchsorted(range_starts, zorder(row))``;
4. tag rows with that pid (vectorized Arrow searchsorted — a binary
   search per row, no 3000-branch CASE ladder in codegen) and
   range-partition on it.

Spatial locality is preserved (each partition is a quadtree block),
volume is balanced (leaves were split until their SAMPLE share fit), and
downstream per-partition work (``applyInPandas`` geometry kernels,
per-block sinks, compaction) sees neither stragglers nor 2-row tasks.

The engine's other skew tools are complementary: ``operators/skew.py``
salts hot JOIN keys, AQE splits hot SHUFFLE partitions after the fact;
this partitioner shapes the layout BEFORE per-partition spatial work,
where AQE cannot help (a single applyInPandas group is unsplittable).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid

__all__ = ["QuadtreePartitioner", "quadtree_partitioner"]

#: driver-side sample cap — the quadtree needs counts, not the data;
#: 200k int64 keys ≈ 1.6 MB on the driver regardless of input size
_SAMPLE_CAP = 200_000


@dataclass(frozen=True)
class QuadtreePartitioner:
    """Immutable partitioning plan: sorted Z-curve range starts (leaf 0
    implicitly starts at 0) + the resolution the keys were built at.
    Pickles into the Arrow UDF closure; reusable across frames so one
    sample pass can lay out every table of a multi-table publish."""

    res: int
    starts: tuple[int, ...]  # ascending; len == n_partitions - 1

    @property
    def num_partitions(self) -> int:
        return len(self.starts) + 1

    def pid_column(self, lon: Column, lat: Column) -> Column:
        """Partition id for a point — Arrow-vectorized binary search over
        the broadcast range starts."""
        bounds = np.asarray(self.starts, dtype=np.int64)
        res = self.res

        @F.pandas_udf("int")
        def _pid(z: pd.Series) -> pd.Series:
            return pd.Series(
                np.searchsorted(bounds, z.to_numpy(np.int64), side="right")
            ).astype("int32")

        return _pid(grid.zorder_expr(lon, lat, res))

    def apply(
        self, df: DataFrame, lon: str = "lon", lat: str = "lat"
    ) -> DataFrame:
        """Repartition ``df`` into quadtree blocks; rows inside each
        partition are Z-ordered so per-file min/max stats stay tight."""
        z = grid.zorder_expr(F.col(lon), F.col(lat), self.res)
        tagged = df.withColumn(
            "_qt_pid", self.pid_column(F.col(lon), F.col(lat))
        ).withColumn("_qt_z", z)
        return (
            tagged.repartitionByRange(self.num_partitions, "_qt_pid")
            .sortWithinPartitions("_qt_pid", "_qt_z")
            .drop("_qt_pid", "_qt_z")
        )


def _leaf_ranges(
    zs: np.ndarray, lo: int, hi: int, depth_bits: int, cap: int, out: list
) -> None:
    """Recursive split of the aligned curve block [lo, hi) (``zs`` sorted):
    emit the block as a leaf when it fits ``cap`` (or bits run out), else
    recurse into its 4 aligned children."""
    n = len(zs)
    if n == 0:
        # empty in the sample → fold into the PRECEDING leaf instead of
        # minting empty partitions (ocean blocks at depth 1 would
        # otherwise each cost a task forever)
        return
    if n <= cap or depth_bits < 2:
        out.append(lo)
        return
    step = (hi - lo) // 4
    for q in range(4):
        a, b = lo + q * step, lo + (q + 1) * step
        i, j = np.searchsorted(zs, a), np.searchsorted(zs, b)
        _leaf_ranges(zs[i:j], a, b, depth_bits - 2, cap, out)


def quadtree_partitioner(
    pts: DataFrame,
    target_rows: int,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 15,
    seed: int = 7,
) -> QuadtreePartitioner:
    """Build the plan from ONE bounded sample pass over ``pts``.

    ``target_rows`` is the intended rows-per-partition in the FULL data;
    the sample cap scales the split threshold accordingly, so the driver
    never holds more than ``_SAMPLE_CAP`` keys no matter the input size.
    """
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    total = pts.count()
    if total == 0:
        return QuadtreePartitioner(res=res, starts=())
    frac = min(1.0, _SAMPLE_CAP / total)
    z = grid.zorder_expr(F.col(lon), F.col(lat), res)
    # bounded driver-side collect: ≈_SAMPLE_CAP int64 keys (~1.6 MB)
    # regardless of input size — the quadtree needs counts, not data
    sample = (
        pts.sample(fraction=frac, seed=seed)
        .select(z.alias("z"))
        .toPandas()["z"]
        .to_numpy(np.int64)
    )
    if len(sample) == 0:  # degenerate tiny-frac draw
        return QuadtreePartitioner(res=res, starts=())
    sample.sort()
    # leaf capacity in SAMPLE rows ≈ target_rows scaled by the sample rate
    cap = max(1, int(round(target_rows * len(sample) / total)))
    depth_bits = 2 * (res + 1)  # zorder_expr interleaves res+1 x-bits
    out: list[int] = []
    _leaf_ranges(sample, 0, 1 << depth_bits, depth_bits, cap, out)
    return QuadtreePartitioner(res=res, starts=tuple(out[1:]))
