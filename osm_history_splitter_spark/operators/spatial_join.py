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

Two physical strategies over the same cover index:

- ``loop``  — one broadcast equi-join per distinct cover resolution (the
  round-1 baseline; optimal when every extract shares one resolution);
- ``ladder`` — ONE scan of the big table: each point derives its whole
  (res, cell) ladder in codegen, explodes it (xL, L = #levels), and a
  single broadcast join on (res, cell) matches all levels at once. This
  is how multi-resolution covers — including H3-style *compacted* covers
  (``catalog.compact_levels``) — join without re-scanning the 100-TB
  input once per level.

``auto`` picks ``loop`` for single-resolution covers, ``ladder`` otherwise.

The output has one row per (point-row, matching extract) — a point in k
overlapping extracts fans out to k rows, exactly the reference's per-extract
writer fan-out. No distinct() is needed under either strategy: a point maps
to exactly one cell per resolution, the cover holds one row per
(extract, res, cell), and each extract's cover is area-disjoint across
levels (compaction replaces children with their exact parent), so the join
cannot duplicate a (point, extract) pair.

Scale notes (100 TB / 10^12 rows): the only wide operation here is the
broadcast hash join against a cover of <= ``max_cover_cells`` rows per
extract — no shuffle of the big table at all. Skew in point density (hot
cities) does not skew this join (broadcast joins have no key-partitioning);
it matters for downstream groupBys and writes, which handle it separately
(salting in ``io.write_extracts``, AQE skew-join for the id-joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid
from ..functions.predicates import bbox_strict_expr, make_pip_udf
from ..plans.catalog import ExtractCatalog

__all__ = ["assign_extracts"]


def _accept_filter(lon: Column, lat: Column, pip, has_poly: bool) -> Column:
    """ONE combined accept predicate — fully-inside cells and the strict-bbox
    refine stay entirely in codegen (constant-size predicate via catalog
    COLUMNS, cut.hpp:36-40); the Arrow PIP only exists when the catalog has
    polygons, and its extract argument is nulled for rows that don't need
    the exact test so the vectorized kernel skips them."""
    jvm_ok = F.col("fully_inside") | (
        (F.col("kind") == "BBOX")
        & bbox_strict_expr(
            lon, lat,
            F.col("minlon"), F.col("minlat"),
            F.col("maxlon"), F.col("maxlat"),
        )
    )
    if has_poly:
        needs_pip = (F.col("kind") != "BBOX") & ~F.col("fully_inside")
        return jvm_ok | F.coalesce(
            pip(F.when(needs_pip, F.col("extract")), lon, lat), F.lit(False)
        )
    return jvm_ok


def assign_extracts(
    points: DataFrame,
    catalog: ExtractCatalog,
    lon_col: str = "lon",
    lat_col: str = "lat",
    strategy: str = "auto",
) -> DataFrame:
    """Inner spatial join: input columns + ``extract`` (one row per match)."""
    if strategy not in ("auto", "loop", "ladder"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if len(catalog) == 0:
        raise ValueError(
            "catalog has no extracts — nothing to assign (a config whose "
            "every line was filtered out parses to an empty catalog)"
        )
    # internal join/cover columns: a caller column with one of these
    # names would be silently overwritten or captured by the broadcast
    # join — fail loudly at the API boundary instead
    reserved = {
        "cell", "res", "_rc", "extract", "fully_inside", "kind",
        "minlon", "minlat", "maxlon", "maxlat",
    } & set(points.columns)
    if reserved:
        raise ValueError(
            f"points frame carries reserved column(s) {sorted(reserved)}: "
            "rename them before assign_extracts (they collide with the "
            "internal cell/cover join columns)"
        )
    spark = points.sparkSession
    out_cols = [F.col(c) for c in points.columns] + [F.col("extract")]

    cover_rows = catalog.cover_rows()
    cover = catalog.cover_df(spark, _rows=cover_rows)
    res_values = sorted({r[1] for r in cover_rows})
    rings = catalog.rings_payload()
    pip = make_pip_udf(rings, catalog.holes_payload()) if rings else None
    has_poly = any(e.kind != "BBOX" for e in catalog)

    lon = F.col(lon_col)
    lat = F.col(lat_col)
    valid = points.filter(lon.isNotNull() & lat.isNotNull())
    accept = _accept_filter(lon, lat, pip, has_poly)

    if strategy == "auto":
        strategy = "loop" if len(res_values) == 1 else "ladder"

    if strategy == "ladder":
        # one scan: the point's full cell ladder is built in codegen and
        # exploded (xL); a single broadcast join on (res, cell) matches
        # every cover level at once.
        ladder = F.array(
            *[
                F.struct(
                    F.lit(r).cast("int").alias("res"),
                    grid.cell_id_expr(lon, lat, r).alias("cell"),
                )
                for r in res_values
            ]
        )
        cand = (
            valid.withColumn("_rc", F.explode(ladder))
            .withColumn("res", F.col("_rc.res"))
            .withColumn("cell", F.col("_rc.cell"))
            .join(F.broadcast(cover), ["res", "cell"])
        )
        return cand.filter(accept).select(*out_cols)

    parts: list[DataFrame] = []
    for res in res_values:
        # one broadcast equi-join per distinct resolution (covers at the
        # same res can share the join; cross-res cell ids must not mix).
        # The big input is scanned once per resolution, not once per
        # accept/refine branch.
        cov = cover.filter(F.col("res") == res).drop("res")
        cand = valid.withColumn("cell", grid.cell_id_expr(lon, lat, res)).join(
            F.broadcast(cov), "cell"
        )
        parts.append(cand.filter(accept).select(*out_cols))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
