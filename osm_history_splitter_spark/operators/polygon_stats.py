"""Per-way ring statistics: integer-exact shoelace area and centroid.

The reference engine treats ways purely as id-lists to clip
(``softcut.hpp:179-212``, ``hardcut.hpp:150-252``) — it never computes a
geometric property of the assembled line/ring. An analytics engine over
the same data model needs the classic per-feature aggregates: signed
area (land-use statistics, "largest lake per extract"), vertex count,
and centroid (label placement, distance-to-feature joins against the
kNN layer).

Distributed shape — two narrow shuffles, both on the way id:

1. ``posexplode(refs)`` (map-side) → join node coordinates on ``ref``
   (one hash equi-join; the node side is the big relation and arrives
   pre-bucketed when the caller uses ``prepare_bucketed_world``-style
   layouts);
2. one window over ``(id ORDER BY pos)`` closes the ring (``lead`` with
   wrap-around to ``first_value``) and emits per-edge shoelace terms;
3. ``groupBy(id)`` sums them — partial aggregation is map-side because
   the window already co-located each way's edges.

Everything is **integer arithmetic on shifted centidegree coordinates**
(the ``xs``/``ys`` convention of ``operators/neighbors.py``), so the
area and centroid numerators are bit-exact in Spark, DuckDB, and
Python — no float enters a compared column. Overflow headroom: a
per-edge cross term is < 2·36000·18000 ≈ 1.3e9; a 2 000-vertex way sums
to < 2.6e12 and the centroid numerator to < 2e17 — both far inside
int64.

Returned columns (twice-values keep everything integral):

- ``nvert``     — vertex count (= ``size(refs)``);
- ``area2``     — TWICE the signed shoelace area (CCW positive);
- ``cx_num``/``cy_num`` — centroid numerators: the true centroid is
  ``(cx_num / (3·area2), cy_num / (3·area2))`` for non-degenerate
  rings; kept as integers so the oracle hash never sees a division.

Open (non-closed) ways get the shoelace of their implicit closure —
the standard convention (equals the polygon area when the way IS a
closed ring, since the wrap edge is then degenerate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["way_ring_stats"]


def way_ring_stats(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Shoelace statistics per way.

    ``ways``: ``(id, refs: array<long>)`` — one row per way (caller
    pre-selects the version of interest; the operator is version-blind).
    ``nodes``: ``(id, xs, ys)`` — integer, non-negative coordinates.
    Ways referencing a node id absent from ``nodes`` are dropped whole
    (inner join semantics — a partial ring's area is meaningless).

    Returns ``(id, nvert, area2, cx_num, cy_num)``, all BIGINT.
    """
    # the DECLARED vertex count rides along with the explode, so the
    # dropped-vertex check below needs no second scan/join of `ways`
    edges = ways.select(
        F.col("id"),
        F.size("refs").alias("nvert"),
        F.posexplode("refs").alias("pos", "ref"),
    ).join(
        nodes.select(
            F.col("id").alias("ref"),
            F.col("xs").cast("long").alias("x"),
            F.col("ys").cast("long").alias("y"),
        ),
        "ref",
    )
    w = Window.partitionBy("id").orderBy("pos")
    full = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    closed = (
        edges.withColumn("xn", F.coalesce(F.lead("x").over(w), F.first("x").over(full)))
        .withColumn("yn", F.coalesce(F.lead("y").over(w), F.first("y").over(full)))
    )
    cross = F.col("x") * F.col("yn") - F.col("xn") * F.col("y")
    # the window already co-located each way's edges on `id`, so this
    # groupBy is Exchange-free (plan-asserted in tests)
    stats = closed.groupBy("id").agg(
        F.count("*").alias("njoined"),
        F.first("nvert").alias("nvert"),
        F.sum(cross).alias("area2"),
        F.sum((F.col("x") + F.col("xn")) * cross).alias("cx_num"),
        F.sum((F.col("y") + F.col("yn")) * cross).alias("cy_num"),
    )
    # drop ways that lost ANY vertex to the inner join: joined count must
    # equal the declared ref count (a partial ring's area is meaningless)
    return stats.filter(F.col("njoined") == F.col("nvert")).select(
        "id",
        F.col("nvert").cast("long").alias("nvert"),
        F.col("area2").cast("long").alias("area2"),
        F.col("cx_num").cast("long").alias("cx_num"),
        F.col("cy_num").cast("long").alias("cy_num"),
    )
