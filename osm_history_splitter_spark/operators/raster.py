"""Raster↔vector bridge (north_rule: "H3/S2 index, point-in-polygon, kNN,
raster↔vector").

A *raster* here is the engine's grid materialized as a table: one row per
cell with aggregate bands — the standard Spark-native raster representation
(cell id is the pixel index; resolution fixes the geotransform).

- ``rasterize``: vector→raster — points aggregated per cell (count + sum
  bands). One map-side-combinable groupBy; no joins.
- ``cell_bounds`` / ``raster_to_points``: raster→vector — cells back to
  center points / corner rings (pure Catalyst arithmetic).
- ``zonal_stats``: raster × polygon — per-extract aggregates over cells
  whose *center* lies in the extract (center-point rule, the common GIS
  convention). Reuses the spatial join: broadcast cover + refine, then one
  aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import grid
from ..plans.catalog import ExtractCatalog
from .spatial_join import assign_extracts

__all__ = ["rasterize", "cell_bounds", "raster_to_points", "zonal_stats"]


def rasterize(
    points: DataFrame,
    res: int,
    value_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Vector→raster: (cell, n[, sum_val]) at resolution ``res``."""
    cells = points.withColumn(
        "cell", grid.cell_id_expr(F.col(lon_col), F.col(lat_col), res)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_val"))
    return cells.groupBy("cell").agg(*aggs)


def cell_center_cols(cell, res: int):
    w = grid.cell_width(res)
    # integer `div`, not `/`: double division loses exactness near 2^53
    ix = F.expr(f"cell div {grid.CELL_SHIFT}")
    iy = cell % F.lit(grid.CELL_SHIFT)
    lon = (ix.cast("double") + 0.5) * w - 180.0
    lat = (iy.cast("double") + 0.5) * w - 90.0
    return lon, lat


def raster_to_points(raster: DataFrame, res: int) -> DataFrame:
    """Raster→vector: cell centers as a point table (bands carried)."""
    lon, lat = cell_center_cols(F.col("cell"), res)
    return raster.select(
        "*", lon.alias("lon"), lat.alias("lat")
    )


def cell_bounds(raster: DataFrame, res: int) -> DataFrame:
    """Raster→vector: each cell's corner ring (closed, lon/lat)."""
    w = grid.cell_width(res)
    ix = F.expr(f"cell div {grid.CELL_SHIFT}").cast("double")
    iy = (F.col("cell") % F.lit(grid.CELL_SHIFT)).cast("double")
    x0 = ix * w - 180.0
    y0 = iy * w - 90.0
    x1 = x0 + w
    y1 = y0 + w
    ring = F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1),
        F.array(x0, y1), F.array(x0, y0),
    )
    return raster.select("*", ring.alias("ring"))


def zonal_stats(
    raster: DataFrame, catalog: ExtractCatalog, res: int
) -> DataFrame:
    """Raster×vector: per-extract aggregates over cell centers (count of
    cells, sum of band values)."""
    pts = raster_to_points(raster, res)
    assigned = assign_extracts(pts, catalog)
    aggs = [
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").alias("n_points"),
    ]
    if "sum_val" in raster.columns:
        aggs.append(F.sum("sum_val").alias("sum_val"))
    return assigned.groupBy("extract").agg(*aggs)


def parent_cell_expr(cell):
    """Cell id at resolution r-1 from a cell at r: both axis indices halve
    (the grid origin is axis-aligned and widths double per level). Pure
    integer shift arithmetic on the PASSED expression (CELL_SHIFT is 2^32,
    both indices non-negative) — exact, codegen-friendly, and correct for
    any column name or computed expression, not just a column literally
    named ``cell``."""
    c = cell.cast("long")
    ix = F.shiftright(c, 32)
    iy = c.bitwiseAND(F.lit(grid.CELL_SHIFT - 1))
    return F.shiftright(ix, 1) * F.lit(grid.CELL_SHIFT) + F.shiftright(iy, 1)


def tile_pyramid(raster: DataFrame, from_res: int, to_res: int) -> DataFrame:
    """Multi-resolution rollup: (res, cell, n[, sum_val]) for every level
    from ``from_res`` down to ``to_res``.

    Each level aggregates the PREVIOUS level (4 children → 1 parent), not
    the raw points — the hypertable/tile-pyramid pattern: total work is
    O(cells) summed over levels (a geometric series), and every groupBy is
    map-side combinable on an already-tiny input. Building L levels from
    raw points instead would scan the planet L times."""
    has_sum = "sum_val" in raster.columns
    aggs = [F.sum("n").alias("n")] + (
        [F.sum("sum_val").alias("sum_val")] if has_sum else []
    )
    cols = ["res", "cell", "n"] + (["sum_val"] if has_sum else [])
    level = raster.withColumn("res", F.lit(from_res))
    out = level.select(*cols)
    for r in range(from_res - 1, to_res - 1, -1):
        level = (
            level.select(parent_cell_expr(F.col("cell")).alias("cell"), "n",
                         *(["sum_val"] if has_sum else []))
            .groupBy("cell")
            .agg(*aggs)
            .withColumn("res", F.lit(r))
        )
        out = out.unionByName(level.select(*cols))
    return out
