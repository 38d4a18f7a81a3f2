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
    direct: DataFrame,
    edges: DataFrame,
    max_iterations: int = 50,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Least fixpoint of ``tracked ⊇ direct ∪ parents(tracked)``.

    ``direct``: (id, extract) relations tracked via n/w/r member hits.
    ``edges``: (child, parent) — parent relation has child as an 'r' member.
    Returns the closed (id, extract) membership, distinct.

    Fast path: the rel→rel edge set is tiny in practice (≲1.5e6 relations
    planet-wide, reference ``softcut.hpp:64``; only 'r'-members form edges).
    When it fits the driver comfortably, compute child→ancestor reachability
    driver-side and close membership with ONE broadcast join instead of an
    iterative multi-job loop — same least fixpoint, fraction of the cost.
    The distributed semi-naive loop remains for adversarially large graphs.
    """
    edges = edges.select("child", "parent").distinct()

    # the edge-count threshold bounds |E|, not the closure size: a deep
    # chain of E edges has an O(E^2) transitive closure. Cap the
    # materialized pair count too and fall through to the distributed
    # semi-naive loop when either bound trips.
    max_pairs = 20 * driver_threshold

    # ONE bounded action decides the path AND fetches the edges: collect up
    # to threshold+1 rows and branch on the length (two separate actions —
    # a limit-count probe then a collect — re-ran the edge subtree twice and
    # cost a scheduling round-trip per membership build; BENCH_r02 measured
    # it as a +40% relation_members regression)
    edge_rows = edges.limit(driver_threshold + 1).collect()
    anc_pairs: list | None = None
    if len(edge_rows) <= driver_threshold:
        parents: dict = {}
        for r in edge_rows:
            parents.setdefault(r["child"], []).append(r["parent"])
        # child -> all transitive ancestors (iterative DFS, cycle-safe)
        anc_pairs = []
        for start in parents:
            seen_ids: set = set()
            stack = list(parents[start])
            while stack:
                p = stack.pop()
                if p in seen_ids:
                    continue
                seen_ids.add(p)
                stack.extend(parents.get(p, ()))
            anc_pairs.extend((start, a) for a in seen_ids)
            if len(anc_pairs) > max_pairs:
                anc_pairs = None  # closure blow-up: use the distributed loop
                break
    if anc_pairs is not None:
        if not anc_pairs:
            return direct.select("id", "extract").distinct()
        spark = direct.sparkSession
        # ONE scan of `direct`: left-join the broadcast child→ancestors map
        # and explode id+ancestors together. The previous
        # `direct ∪ (direct ⋈ anc)` shape scanned the (unpersisted, join-
        # heavy) direct subtree twice per action.
        anc_map: dict = {}
        for child, a in anc_pairs:
            anc_map.setdefault(child, []).append(a)
        anc = spark.createDataFrame(
            [(c, ancs) for c, ancs in anc_map.items()],
            "child long, ancs array<long>",
        )
        return (
            direct.join(F.broadcast(anc), direct["id"] == anc["child"], "left")
            .select(
                F.explode(
                    F.concat(
                        F.array("id"),
                        F.coalesce("ancs", F.array().cast("array<long>")),
                    )
                ).alias("id"),
                "extract",
            )
            .distinct()
        )
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
    else:
        # the cap round may have discovered the LAST parents: converged
        # exactly at max_iterations iff that final frontier has no
        # further undiscovered ancestors — check before failing
        leftover = (
            frontier.join(edges, frontier["id"] == edges["child"])
            .select(F.col("parent").alias("id"), "extract")
            .join(seen, ["id", "extract"], "left_anti")
        )
        if leftover.isEmpty():
            return seen
        # a truncated closure is silently-wrong membership — fail loudly
        # (real rel→rel nesting is single-digit deep; the reference's
        # cascading_relations recursion runs to fixpoint, softcut.hpp:269)
        raise RuntimeError(
            f"relation closure did not converge in {max_iterations} "
            "iterations — rel→rel nesting deeper than the cap; raise "
            "max_iterations"
        )
    return seen
