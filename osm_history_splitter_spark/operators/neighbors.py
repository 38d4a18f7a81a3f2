"""Distance-bounded spatial self-join (ε-neighbor pairs) and grid-DBSCAN.

The reference engine answers one spatial question — "which extract(s)
contain this point?" (``cut.hpp``'s per-extract ``IndexedPointInAreaLocator``
probe). A distributed tiling engine needs the symmetric question too:
"which PAIRS of points are within ε of each other?" — the primitive under
near-duplicate geotag detection, POI conflation, and density clustering.
A naive answer is the n² cross join; at 10¹² rows that is not a plan, it
is an outage.

The classic distributed ε-join (the GeoSpark / Apache Sedona shape,
re-derived here for a plain DataFrame engine) buckets points into a grid
whose cell edge equals ε, so every qualifying pair lives in the SAME or an
ADJACENT cell, and the cross join collapses to a cell equi-join:

- the LEFT side keeps each point once, keyed by its home cell;
- the RIGHT side replicates each point into its 3×3 cell neighborhood
  (constant ×9 map-side explode — no shuffle amplification beyond it);
- the join is a plain hash equi-join on the cell key, so Catalyst
  hash-partitions both sides and AQE's skew-join split handles hot cells
  (city-center skew) without a custom salter.

**Exactly-once pair emission without a distinct**: for a qualifying pair
(a, b) with ``a.id < b.id``, the join matches twice — (left=a, right=b's
replica in a's home cell) and (left=b, right=a's replica in b's home
cell) — and the ``left.id < right.id`` predicate keeps exactly the first.
No post-join ``dropDuplicates`` (which would be a second shuffle over the
pair set, the largest relation in the query).

Coordinates are integer (centidegrees) end-to-end, so the squared
distance and the cell key are bit-exact in Spark, DuckDB, and numpy —
the oracle hash gate never sees a float.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["within_distance_pairs", "grid_dbscan_cells"]

#: cell-key packing stride: cells are (xs // r, ys // r) with
#: xs ∈ [0, 36000), so xs // r < 2**16 for any r ≥ 1 — 2**32 packing can
#: never collide x into y
_PACK = 2**32


def _cell(xs: Column, ys: Column, r: int) -> Column:
    """Pack the ε-grid cell of a NON-NEGATIVE integer point into int64.

    Floor division on non-negative ints is identical in Spark, DuckDB
    (`//`), and Python (`//`) — negative coordinates are shifted out
    before this is called, so truncation-vs-floor never diverges. The
    quotient is computed as ``(xs - xs % r) / r``: the dividend is then an
    exact multiple, so the float division is IEEE-exact for ANY magnitude
    (a bare ``xs / r`` cast would be one ulp from flooring the wrong way
    once coordinates outgrow the 2^52 exact-integer range of doubles).
    """

    def fdiv(c: Column) -> Column:
        return ((c - c % F.lit(r)) / F.lit(r)).cast("long")

    return (fdiv(xs) * F.lit(_PACK) + fdiv(ys)).cast("long")


def within_distance_pairs(
    pts: DataFrame, radius: int, id_col: str = "id"
) -> DataFrame:
    """All unordered point pairs within ``radius`` (planar, integer units).

    ``pts`` must carry ``id_col`` plus integer columns ``xs``/``ys``
    shifted to be non-negative (centidegrees + 18000/9000 for lon/lat).
    Returns ``(id_a, id_b, dist2)`` with ``id_a < id_b`` and
    ``dist2 = (xa-xb)² + (ya-yb)² ≤ radius²`` — planar semantics (the
    geodesic/antimeridian cases belong to the PIP layer; an ε-join over
    a wrapped domain would pre-duplicate a ±360° ghost column here).

    Scale: one ×9 map-side explode, ONE hash equi-join on the cell key,
    zero distinct. ε controls the replication constant, never the join
    fan-out; hot cells split under AQE skew handling.
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    left = pts.select(
        F.col(id_col).alias("id_a"),
        xs.alias("xa"),
        ys.alias("ya"),
        _cell(xs, ys, radius).alias("cell"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    right = (
        pts.select(
            F.col(id_col).alias("id_b"),
            xs.alias("xb"),
            ys.alias("yb"),
            _cell(xs, ys, radius).alias("home"),
        )
        .withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        # replica in the neighbor cell: qualifying partners' HOME cells
        # are exactly the 3×3 block around this point's home
        .withColumn(
            "cell", F.col("home") + F.col("dx") * F.lit(_PACK) + F.col("dy")
        )
        .drop("home", "dx", "dy")
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(radius * radius))
        .select("id_a", "id_b", d2.cast("long").alias("dist2"))
    )


def grid_dbscan_cells(
    pts: DataFrame, eps: int, min_pts: int, max_iter: int = 50
) -> DataFrame:
    """Grid-DBSCAN: density clusters as connected components of dense cells.

    The grid relaxation of DBSCAN (CLIQUE/GriDBSCAN family): a cell of
    edge ``eps`` is *dense* when it holds ≥ ``min_pts`` points; clusters
    are the 8-connected components of dense cells. Each point in a dense
    cell inherits its component's cluster id (= the MIN dense-cell id in
    the component — deterministic, so the oracle can reproduce it).

    Returns ``(id, cell, cluster)`` for points in dense cells only (points
    in sparse cells are DBSCAN noise and are dropped).

    Scale: the component step runs on the DENSE-CELL graph — already
    aggregated, orders of magnitude smaller than the point set — via the
    same min-label-propagation + pointer-jumping loop the dedup layer
    uses (``operators/dedup.py``), O(log diameter) rounds.
    """
    from .dedup import connected_components

    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    cells = pts.select(
        F.col("id"), _cell(xs, ys, eps).alias("cell")
    )
    dense = (
        cells.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(min_pts))
        .select("cell")
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    nbr = (
        dense.withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        .select(
            F.col("cell").alias("src"),
            (F.col("cell") + F.col("dx") * F.lit(_PACK) + F.col("dy")).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    # edges between dense cells only (semi-join prunes ghost neighbors)
    edges = nbr.join(dense.select(F.col("cell").alias("dst")), "dst").select(
        "src", "dst"
    )
    comp = connected_components(
        edges, a_col="src", b_col="dst", max_iterations=max_iter
    ).select(F.col("doc_id").alias("cell"), F.col("cluster_id").alias("comp"))
    # connected_components only returns vertices with ≥1 edge; an ISOLATED
    # dense cell is still its own DBSCAN cluster → coalesce to self
    labeled = dense.join(comp, "cell", "left").select(
        "cell", F.coalesce("comp", "cell").alias("cluster")
    )
    return cells.join(labeled, "cell").select("id", "cell", "cluster")
