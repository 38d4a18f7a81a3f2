"""kNN-to-extract-centroid (north_rule) — grid ring expansion.

Full-window top-k scans every point per centroid; the scale path prunes
with the grid index: expand kRings around each centroid's cell until the
candidate cells are guaranteed to contain the true top-k (ring r is
sufficient once ≥k points lie within r−1 rings, because any point outside
ring r is farther than every point inside ring r−1 in Chebyshev-cell
distance × cell width), then run the exact ranking only over candidates.

The per-cell histogram is a cheap one-pass groupBy, reusable across all
centroids; ring sufficiency is decided driver-side from the (small)
histogram slice near each centroid.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import grid
from ..functions.predicates import haversine_km_expr

__all__ = ["knn_to_centroids", "knn_full_window"]


def _dist2(lon, lat, cx, cy):
    return (lon - cx) * (lon - cx) + (lat - cy) * (lat - cy)


def knn_full_window(
    points: DataFrame, centroids: dict[str, tuple], k: int
) -> DataFrame:
    """Exact baseline: window top-k over all points per centroid."""
    spark = points.sparkSession
    cents = spark.createDataFrame(
        [(n, float(c[0]), float(c[1])) for n, c in centroids.items()],
        "extract string, cx double, cy double",
    )
    d = points.crossJoin(F.broadcast(cents)).withColumn(
        "dist2", _dist2(F.col("lon"), F.col("lat"), F.col("cx"), F.col("cy"))
    )
    w = Window.partitionBy("extract").orderBy(F.col("dist2").asc(), F.col("id").asc())
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("extract", "rnk", "id", "dist2")
    )


def knn_to_centroids(
    points: DataFrame,
    centroids: dict[str, tuple],
    k: int,
    res: int = 6,
    max_ring: int = 64,
) -> DataFrame:
    """Ring-expansion kNN: prune to candidate cells, exact rank within.

    Sparse-region guard: if fewer than k points lie within ``max_ring``
    rings of a centroid (or the expansion never satisfied the sufficiency
    bound), that centroid falls back to the exact full-window path — the
    candidate cover is only provably complete when the bound held. Grid
    cells don't wrap the antimeridian (lon is clamped per cell_id_expr),
    so a centroid near ±180° also relies on this exact fallback.
    """
    # per-cell histogram is bounded by the grid size (<= 2*4^res cells),
    # post-aggregation — safe to collect driver-side
    pts = points.withColumn(
        "cell", grid.cell_id_expr(F.col("lon"), F.col("lat"), res)
    ).persist()
    hist = {
        r["cell"]: r["n"]
        for r in pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    probe_rows = []
    fallback: dict[str, tuple] = {}
    for name, (cx, cy) in centroids.items():
        center = int(grid.cell_ids_np(np.array([cx]), np.array([cy]), res)[0])
        inner = 0
        ring = 1
        # expand until the CLOSED ring r-1 already holds >= k points: their
        # Euclidean distance is at most r*w*sqrt(2), while any point beyond
        # Chebyshev ring R is at least R*w away — so candidates out to
        # R = ceil(sqrt(2)*r)+1 provably contain the true top-k
        while ring <= max_ring:
            inner = sum(
                hist.get(int(c), 0) for c in grid.neighbor_ring(center, ring - 1)
            )
            if inner >= k:
                break
            ring += 1
        if inner < k:
            # sufficiency bound never held — exact path for this centroid
            fallback[name] = (cx, cy)
            continue
        safe = int(np.ceil(ring * np.sqrt(2.0))) + 1
        for c in grid.neighbor_ring(center, safe):
            probe_rows.append((name, float(cx), float(cy), int(c)))

    spark = points.sparkSession
    if not probe_rows:
        pts.unpersist()
        return knn_full_window(points, centroids, k)
    probes = spark.createDataFrame(
        probe_rows, "extract string, cx double, cy double, cell long"
    )
    cand = pts.join(F.broadcast(probes), "cell")
    w = Window.partitionBy("extract").orderBy(F.col("dist2").asc(), F.col("id").asc())
    out = (
        cand.withColumn(
            "dist2", _dist2(F.col("lon"), F.col("lat"), F.col("cx"), F.col("cy"))
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("extract", "rnk", "id", "dist2")
    )
    if fallback:
        out = out.unionByName(knn_full_window(points, fallback, k))
    return out


def idw_interpolate(
    points: DataFrame,
    qpts: DataFrame,
    radius: float,
    val_col: str = "val",
    weight_scale: int = 100_000_000,
    d2_quant: int = 10_000,
) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation at query points.

    ``points`` carries (lon, lat, val_col); ``qpts`` carries (qid, qx, qy)
    and is broadcast (query sets are small — the same contract as the kNN
    centroid path; for large query sets, generate candidates with the
    grid-ring expansion of :func:`knn_to_centroids` instead of the
    broadcast). Each in-radius point contributes weight
    ``weight_scale div (100 + floor(d2 * d2_quant))`` — an INTEGER, so the
    weighted mean ``sum(w*val) div sum(w)`` is order-independent exact
    arithmetic, reproducible bit-for-bit across engines (the repo-wide
    determinism rule; float IDW would hash-diverge under Spark's
    non-deterministic reduce order).

    Query points with no in-radius neighbor produce no row (the caller
    left-joins if 'null interpolation' rows are wanted).
    """
    r2 = float(radius) * float(radius)
    j = points.crossJoin(F.broadcast(qpts)).withColumn(
        "d2",
        (F.col("lon") - F.col("qx")) * (F.col("lon") - F.col("qx"))
        + (F.col("lat") - F.col("qy")) * (F.col("lat") - F.col("qy")),
    )
    j = (
        j.filter(F.col("d2") < F.lit(r2))
        .withColumn("d2q", F.floor(F.col("d2") * F.lit(float(d2_quant))).cast("long"))
        .withColumn("w", F.expr(f"{weight_scale}L div (100 + d2q)"))
    )
    return j.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.expr(f"sum(w * {val_col}) div sum(w)").alias("idw_val"),
    )


def knn_haversine(
    points: DataFrame, centroids: dict[str, tuple], k: int
) -> DataFrame:
    """Great-circle variant (Catalyst trig, no UDF — SURVEY §2.8)."""
    spark = points.sparkSession
    cents = spark.createDataFrame(
        [(n, float(c[0]), float(c[1])) for n, c in centroids.items()],
        "extract string, cx double, cy double",
    )
    d = points.crossJoin(F.broadcast(cents)).withColumn(
        "km",
        haversine_km_expr(F.col("lon"), F.col("lat"), F.col("cx"), F.col("cy")),
    )
    w = Window.partitionBy("extract").orderBy(F.col("km").asc(), F.col("id").asc())
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("extract", "rnk", "id", "km")
    )
