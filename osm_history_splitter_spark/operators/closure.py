"""J4 — relation→relation transitive closure (reference
``softcut.hpp:257-287``): when a relation is tracked, every relation that
*references* it (directly or transitively) becomes tracked. Propagation is
upward only — members of a tracked relation are NOT pulled in (softcut keeps
dead references, reference ``README.md:17``).

The reference repairs stream-order sensitivity with a child→parent multimap
and recursive marking; set-based, that is a least fixpoint, which we compute
with a driver-side semi-naive loop. The relation graph is tiny relative to
the data (~1.5e6 relations planet-wide, reference ``softcut.hpp:64``), and
real-world nesting depth is single-digit, so the loop runs a handful of
cheap, fully distributed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["relation_closure"]


def relation_closure(
    direct: DataFrame, edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Least fixpoint of ``tracked ⊇ direct ∪ parents(tracked)``.

    ``direct``: (id, extract) relations tracked via n/w/r member hits.
    ``edges``: (child, parent) — parent relation has child as an 'r' member.
    Returns the closed (id, extract) membership, distinct.
    """
    edges = edges.select("child", "parent").distinct()
    # semi-naive: only join the newly-discovered frontier each round
    seen = direct.select("id", "extract").distinct().localCheckpoint(eager=True)
    frontier = seen
    for _ in range(max_iterations):
        parents = (
            frontier.join(edges, frontier["id"] == edges["child"])
            .select(F.col("parent").alias("id"), "extract")
            .distinct()
            .join(seen, ["id", "extract"], "left_anti")
            .localCheckpoint(eager=True)  # truncate the growing lineage
        )
        if parents.isEmpty():
            break
        seen = seen.unionByName(parents).localCheckpoint(eager=True)
        frontier = parents
    return seen
