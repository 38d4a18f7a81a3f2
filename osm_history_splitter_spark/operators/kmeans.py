"""Deterministic k-means (Lloyd's) over integer-quantized embeddings.

The clustering counterpart of the IVF index build (``ann.py``): IVF
hashes vectors into fixed lists; this iterates true centroid refinement.
Web-pipeline use: corpus bucketing for curriculum/mixture construction
and as a trained coarse quantizer for IVF.

Determinism contract (what makes a DuckDB oracle possible):
- centroids are INTEGER vectors: the update is a truncated-floor mean
  ``floor(sum / count)`` per dimension, bit-identical across engines.
  The division IS double division in both engines, and THAT is the
  binding contract: both engines perform the same correctly-rounded
  double op on the same operands, so the result is bit-identical even
  in the corner where it differs from the exact integer floor (the
  rounded quotient can cross an integer boundary once counts reach
  ~1/(half-ulp of the quotient), e.g. sum = k*count - 1 near the 2^53
  envelope's edge). Exactness-vs-true-floor additionally holds while
  each per-(cluster, dim) sum fits 2^53 AND 1/count exceeds half an
  ulp of the quotient — comfortably true well inside ≈ 9e10 rows per
  cluster at the QUANT=1e5 component scale;
- assignment is argmin of integer squared L2; ties break to the LOWEST
  cluster id (``array_position`` finds the FIRST minimum);
- empty clusters keep their previous centroid;
- init = the quantized embeddings of the ``k`` lowest vector ids (the
  deterministic stand-in for kmeans++ — seeding strategy is orthogonal
  to the engine mechanics).

Scale shape per iteration: assignment is a map-side expression over
broadcast centroid literals (k*dim integers baked into the plan — no
join, no shuffle); the update is ONE map-side-combinable shuffle
(groupBy cluster after a posexplode to (cluster, dim) keys, partial
sums on the mappers). Centroids live on the driver between iterations —
k*dim longs, KBs even at k=65536 — exactly like the IVF probe table.

At 100 TB the cost is iterations × (one scan + one narrow shuffle of
k*dim keys); the embedding payload itself never shuffles. Mega-k
(k ~ 1e6) would move the assignment from literals to a broadcast join
against a centroid table — same plan the IVF probe already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans"]


def _dist_expr(qcol: str, cent: list[int]) -> F.Column:
    lit = ",".join(f"{v}L" for v in cent)
    return F.expr(
        f"aggregate(zip_with({qcol}, array({lit}),"
        " (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    )


def _assign(e: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    dists = F.array(*[_dist_expr("q", cents[j]) for j in sorted(cents)])
    return e.withColumn(
        "cluster",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def kmeans(
    e: DataFrame, k: int = 8, num_iter: int = 2
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Cluster ``e(vid: long, q: array<long>)``; returns (assignments,
    final centroids). Assignments carry ``vid, cluster, dist2``.

    Cache lifetime: ``e`` stays persisted after return (the returned
    assignment references it; the caller's action reuses the cache).
    Long-lived sessions should ``spark.catalog.clearCache()`` between
    unrelated jobs."""
    # init: the k lowest-vid quantized vectors — tiny bounded driver
    # collect (k rows), the same role as the IVF centroid literals
    cents: dict[int, list[int]] = {
        i: list(r["q"])
        for i, r in enumerate(
            e.orderBy("vid").limit(k).collect()
        )
    }
    e = e.persist()
    for _ in range(num_iter):
        assigned = _assign(e, cents)
        # truncated-floor integer mean per (cluster, dim); post-aggregation
        # driver collect is k*dim longs — bounded metadata, like the
        # closure fast path
        rows = (
            assigned.select(
                "cluster", F.posexplode("q").alias("d", "x")
            )
            .groupBy("cluster", "d")
            .agg(
                F.floor(F.sum("x") / F.count("*")).cast("long").alias("c")
            )
            .collect()  # bounded post-aggregation metadata: k*dim rows
        )
        new: dict[int, list[int]] = {}
        for r in rows:
            new.setdefault(r["cluster"], {})[r["d"]] = r["c"]
        cents = {
            j: (
                [new[j][d] for d in sorted(new[j])]
                if j in new
                else cents[j]  # empty cluster keeps its centroid
            )
            for j in cents
        }
    final = _assign(e, cents)
    dists = F.array(*[_dist_expr("q", cents[j]) for j in sorted(cents)])
    return (
        final.withColumn("dist2", F.array_min(dists).cast("long")).select(
            "vid", "cluster", "dist2"
        ),
        cents,
    )
