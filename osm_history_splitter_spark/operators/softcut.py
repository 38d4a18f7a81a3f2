"""Softcut — dual-pass, history- and reference-complete extraction
(reference ``softcut.hpp``). The flagship operator.

Guarantees (reference ``softcut.hpp:56-59`` + test fixture
``test/version-two-node-after.osh``):

- **history-complete**: membership is by object *id* — if any version of an
  object qualifies, every version is emitted (pass-2 semi-joins by id,
  ``softcut.hpp:329-399``);
- **reference-complete for ways**: all node ids used by *any version* of a
  tracked way are emitted ("extra nodes", ``softcut.hpp:98-111``);
- relations referencing tracked objects are included, closed transitively
  over relation→relation references (``softcut.hpp:269-287``); members
  pointing outside the extract are kept as dead references;
- emitted rows are the **original rows, unmodified** (``softcut.hpp:357-370``
  writes the way it read) — the byte-identity invariant.

Spark shape — "pass 1" is a DAG of membership (marker) tables, the
distributed replacement for the reference's per-extract bitsets
(``growing_bitset.hpp``); "pass 2" re-joins the full entity tables against
the markers by id. The reference's reliance on version-adjacency in the way
stream (``softcut.hpp:181-185``) is replaced by an order-free
``groupBy(id)`` formulation — the engine makes NO input-order assumptions.

Scale notes: marker tables carry (id, extract) only — a few bytes per
tracked object, the DataFrame analog of the ~350 MB/extract bitset budget
(``softcut.hpp:63-65``). They are persisted (a) to cut re-computation between
the two passes — the same role as the in-memory bitsets — and (b) as the
checkpoint/resume point. The pass-2 joins shuffle on id; at 100 TB bucket
both sides by id (bucketed tables co-locate the join with zero shuffle), and
AQE's skew-join splits hot extracts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.catalog import ExtractCatalog
from .closure import relation_closure
from .spatial_join import assign_extracts

__all__ = ["softcut_membership", "softcut", "SoftcutMembership", "SoftcutResult"]


@dataclass
class SoftcutMembership:
    """Pass-1 output: distinct (id, extract) marker tables.

    ``relation_members`` is lazy: the rel→rel closure runs eager driver
    actions (edge count, fast-path collect), so consumers that only need
    node/way markers (e.g. the node output path) must not pay for it.
    """

    node_members: DataFrame        # nodes directly inside
    way_members: DataFrame         # ways with >=1 tracked node ref
    extra_nodes: DataFrame         # all refs of all versions of tracked ways
    _relation_members: object = None  # DataFrame, or 0-arg thunk building it
    way_refs: DataFrame | None = None  # distinct (way id, ref) across versions
    #   — exposed so the CDC index bootstrap (operators/incremental.py)
    #   reuses the persisted explode instead of re-running it
    _persisted: list | None = None  # every frame _p() cached (incl. the
    #   internal members explode), released together by unpersist()

    @property
    def relation_members(self) -> DataFrame:
        """Relations closed over rel→rel refs (computed on first access)."""
        if callable(self._relation_members):
            self._relation_members = self._relation_members()
        return self._relation_members

    def unpersist(self) -> None:
        """Release every frame pass 1 cached. Call once the markers are
        CHECKPOINTED (run_split / the CDC fallback re-read them from the
        store) — a long-lived service would otherwise pin each tick's
        full-world explodes in executor storage forever."""
        for df in self._persisted or []:
            df.unpersist()

    def all_nodes(self) -> DataFrame:
        """node ∪ extra-node trackers (reference ``softcut.hpp:339``)."""
        return self.node_members.unionByName(self.extra_nodes).distinct()


@dataclass
class SoftcutResult:
    nodes: DataFrame
    ways: DataFrame
    relations: DataFrame


def softcut_membership(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog: ExtractCatalog,
    persist: bool = True,
    way_refs_hint: DataFrame | None = None,
    rel_members_hint: DataFrame | None = None,
) -> SoftcutMembership:
    """Pass 1 (mark): build the four marker tables (``softcut.hpp:88-304``).

    ``way_refs_hint`` / ``rel_members_hint``: optional PRE-EXPLODED forms
    of the reference columns — ``(id, ref)`` way references (multiset
    equal to exploding every version's ``refs``) and
    ``(id, mtype, ref)`` relation members. Pass 1 only ever consumes the
    exploded multisets, so a caller that derives the entity tables from a
    normalized source (``collect_list`` → array) can hand the
    pre-aggregation rows straight in and skip both the array assembly
    and its re-explode — identical markers, two fewer wide aggregations
    (guide §1.2 "don't compute things you throw away"). The hints are
    trusted to match ``ways``/``relations``; the default path derives
    them from the entity frames."""

    persisted: list[DataFrame] = []

    def _p(df: DataFrame) -> DataFrame:
        if not persist:
            return df
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(df)
        return df

    # J1 — per-version containment, then per-id distinct (softcut.hpp:140-147)
    node_members = _p(
        assign_extracts(nodes, catalog).select("id", "extract").distinct()
    )

    # way refs across ALL versions of a way id, deduped once and reused for
    # J2 and J5 (replaces the version-adjacency streaming trick)
    way_refs = (
        way_refs_hint.select("id", "ref")
        if way_refs_hint is not None
        else ways.select("id", F.explode("refs").alias("ref"))
    ).distinct()
    way_refs = _p(way_refs)

    # J2 — way tracked iff ANY ref is a tracked node (EXISTS => distinct)
    way_members = _p(
        way_refs.join(
            node_members.select(F.col("id").alias("ref"), "extract"), "ref"
        )
        .select("id", "extract")
        .distinct()
    )

    # J5 — reference-completeness: every ref of every version of a tracked
    # way becomes an extra node (softcut.hpp:98-111)
    extra_nodes = _p(
        way_members.join(way_refs, "id")
        .select(F.col("ref").alias("id"), "extract")
        .distinct()
    )

    # J3 — direct relation hits via typed members (softcut.hpp:242-256).
    # Persisted: this explode feeds BOTH the direct n/w hits and the rel→rel
    # edge set, and the closure's bounded edge-collect is a separate action —
    # without the persist the (expensive, collect_list-grouped) relations
    # subtree re-runs once per action.
    mem = _p(
        rel_members_hint.select("id", "mtype", "ref")
        if rel_members_hint is not None
        else relations.select(
            "id",
            F.explode("members").alias("m"),
        ).select(
            "id", F.col("m.type").alias("mtype"), F.col("m.ref").alias("ref")
        )
    )
    trackers = (
        node_members.select(F.lit("n").alias("mtype"), F.col("id").alias("ref"), "extract")
        .unionByName(
            way_members.select(
                F.lit("w").alias("mtype"), F.col("id").alias("ref"), "extract"
            )
        )
    )
    direct_nw = (
        mem.filter(F.col("mtype").isin("n", "w"))
        .join(trackers, ["mtype", "ref"])
        .select("id", "extract")
        .distinct()
    )

    # J4 — closure over rel->rel edges; 'r'-member direct hits are subsumed
    # by the fixpoint (child tracked => parent tracked), which is exactly the
    # net effect of stream-time checks + the cascading multimap repair
    edges = (
        mem.filter(F.col("mtype") == "r")
        .select(F.col("ref").alias("child"), F.col("id").alias("parent"))
        .distinct()
    )

    return SoftcutMembership(
        node_members=node_members,
        way_members=way_members,
        extra_nodes=extra_nodes,
        _relation_members=lambda: _p(relation_closure(direct_nw, edges)),
        way_refs=way_refs,
        _persisted=persisted,
    )


def softcut(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog: ExtractCatalog,
    persist: bool = True,
) -> SoftcutResult:
    """Pass 1 + pass 2: emit original rows per extract, membership by id
    (``softcut.hpp:310-416``)."""
    m = softcut_membership(nodes, ways, relations, catalog, persist=persist)
    out_nodes = nodes.join(m.all_nodes(), "id")
    out_ways = ways.join(m.way_members, "id")
    out_rels = relations.join(m.relation_members, "id")
    return SoftcutResult(nodes=out_nodes, ways=out_ways, relations=out_rels)
