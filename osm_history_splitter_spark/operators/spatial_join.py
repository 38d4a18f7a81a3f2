"""J1 — the point×extract spatial join (reference ``hardcut.hpp:106-119``,
``softcut.hpp:140-147``: every node version tested against every extract).

Spark-first design (filter-and-refine, no cross join, no shuffle):

1. each point gets a grid cell id via pure Catalyst arithmetic
   (``grid.cell_id_expr`` — stays in whole-stage codegen);
2. the extract catalog's *cell cover* (cells flagged fully-inside vs
   boundary) is **broadcast** and equi-joined on the cell id;
3. fully-inside candidates are accepted JVM-side with zero further work —
   the analog of the reference's bbox cheap path (``cut.hpp:35-41``);
4. boundary candidates are refined: BBOX extracts by strict Catalyst
   comparisons, polygon extracts by the vectorized exact-PIP pandas UDF
   (interior-only, ``cut.hpp:42-49``).

The output has one row per (point-row, matching extract) — a point in k
overlapping extracts fans out to k rows, exactly the reference's per-extract
writer fan-out. Because a point maps to exactly one cell per resolution and
the cover holds one row per (extract, cell), no distinct() is needed: the
join cannot duplicate a (point, extract) pair.

Scale notes (100 TB / 10^12 rows): the only wide operation here is the
broadcast hash join against a cover of ≤ ``max_cover_cells`` rows per
extract — no shuffle of the big table at all. Skew in point density (hot
cities) does not skew this join (broadcast joins have no key-partitioning);
it matters for downstream groupBys and writes, which handle it separately
(salting in ``io.write_extracts``, AQE skew-join for the id-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import grid
from ..functions.predicates import bbox_strict_expr, make_pip_udf
from ..plans.catalog import ExtractCatalog

__all__ = ["assign_extracts"]


def assign_extracts(
    points: DataFrame,
    catalog: ExtractCatalog,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Inner spatial join: input columns + ``extract`` (one row per match)."""
    spark = points.sparkSession
    out_cols = [F.col(c) for c in points.columns] + [F.col("extract")]

    cover = catalog.cover_df(spark)
    res_values = sorted({r for r in catalog.resolutions().values()})
    bbox_by_name = catalog.bbox_payload()
    rings = catalog.rings_payload()
    pip = make_pip_udf(rings) if rings else None
    kinds = {e.name: e.kind for e in catalog}

    lon = F.col(lon_col)
    lat = F.col(lat_col)
    valid = points.filter(lon.isNotNull() & lat.isNotNull())

    parts: list[DataFrame] = []
    for res in res_values:
        cov = cover.filter(F.col("res") == res).drop("res")
        # restrict to extracts at this resolution to avoid accidental
        # cross-res cell-id collisions
        names_at_res = [n for n, r in catalog.resolutions().items() if r == res]
        cov = cov.filter(F.col("extract").isin(names_at_res))
        cand = valid.withColumn("cell", grid.cell_id_expr(lon, lat, res)).join(
            F.broadcast(cov), "cell"
        )
        accepted = cand.filter(F.col("fully_inside")).select(*out_cols)
        parts.append(accepted)

        boundary = cand.filter(~F.col("fully_inside"))
        bbox_names = [n for n in names_at_res if kinds[n] == "BBOX"]
        poly_names = [n for n in names_at_res if kinds[n] != "BBOX"]
        if bbox_names:
            # strict bounds per extract, as one OR-of-ANDs Catalyst predicate
            pred = F.lit(False)
            for n in bbox_names:
                mnlon, mnlat, mxlon, mxlat = bbox_by_name[n]
                pred = pred | (
                    (F.col("extract") == n)
                    & bbox_strict_expr(lon, lat, mnlon, mnlat, mxlon, mxlat)
                )
            parts.append(
                boundary.filter(F.col("extract").isin(bbox_names))
                .filter(pred)
                .select(*out_cols)
            )
        if poly_names:
            parts.append(
                boundary.filter(F.col("extract").isin(poly_names))
                .filter(pip(F.col("extract"), lon, lat))
                .select(*out_cols)
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
