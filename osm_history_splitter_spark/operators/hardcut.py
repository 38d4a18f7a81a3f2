"""Hardcut — single-pass, version-local clipping (reference
``hardcut.hpp``). Not history-complete by design (``hardcut.hpp:56-59``).

Semantics reproduced exactly:

- a node **version** is written iff it is inside the extract
  (``hardcut.hpp:111-114``); the node **id** is tracked if any version was
  inside (``hardcut.hpp:117`` — the bitset is per id, and all node versions
  stream before any way);
- a way version is rebuilt keeping only refs whose node id is tracked, in
  original ref order (``hardcut.hpp:150-176``); written iff ≥ 2 refs remain
  (``hardcut.hpp:185-188``); the way **id** is tracked only when a version
  was actually written (the short-way ``continue`` skips the tracker);
- a relation version is rebuilt keeping only members with type 'n'/'w' whose
  ref id is tracked (``hardcut.hpp:228-251`` — 'r' members are never
  resolved, the documented hardcut limitation, ``README.md:26``); written iff
  ≥ 1 member remains.

Spark shape: one spatial broadcast join (J1) + two explode/semi-join/
re-assemble clips. The re-assembly uses posexplode + ordered collect_list —
ref order is the original array order, never a timestamp or input order
(distributed correctness: no input-order assumptions, SURVEY §7).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.catalog import ExtractCatalog
from .spatial_join import assign_extracts

__all__ = ["hardcut", "HardcutResult"]


@dataclass
class HardcutResult:
    nodes: DataFrame       # node versions inside, + extract
    ways: DataFrame        # clipped way versions, + extract
    relations: DataFrame   # clipped relation versions, + extract


def hardcut(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog: ExtractCatalog,
) -> HardcutResult:
    # --- nodes: J1 per version ---------------------------------------------
    node_hits = assign_extracts(nodes, catalog)           # per (id, version)
    out_nodes = node_hits

    # node id tracked per extract if ANY version inside (hardcut.hpp:117)
    node_tracker = node_hits.select("id", "extract").distinct()

    # --- ways: clip refs against node_tracker (hardcut.hpp:150-188) --------
    # shuffle discipline: explode/join/groupBy only the narrow key columns
    # (id, version, pos, ref, extract); the wide payload (tags, user, ...)
    # is re-attached afterwards with one equi-join — at 100 TB the clip
    # shuffle moves a few dozen bytes per ref, not whole rows
    way_cols = [c for c in ways.columns if c != "refs"]
    refs = ways.select("id", "version", F.posexplode("refs").alias("pos", "ref"))
    kept = refs.join(
        node_tracker.select(F.col("id").alias("ref"), F.col("extract")),
        "ref",
    )
    clipped_keys = (
        kept.groupBy("id", "version", "extract")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("ref")))
            ).alias("pr")
        )
        .withColumn("refs", F.col("pr.ref"))
        .drop("pr")
        .filter(F.size("refs") >= 2)
    )
    out_ways = clipped_keys.join(
        ways.drop("refs"), ["id", "version"]
    ).select(*([F.col(c) for c in ways.columns] + [F.col("extract")]))

    # way id tracked iff some version written (hardcut.hpp:195 after the
    # short-way continue)
    way_tracker = clipped_keys.select("id", "extract").distinct()

    # --- relations: clip members, types n/w only (hardcut.hpp:228-251) -----
    mem = relations.select(
        "id", "version", F.posexplode("members").alias("pos", "m")
    )
    trackers = node_tracker.select(
        F.lit("n").alias("mtype"), F.col("id").alias("ref"), "extract"
    ).unionByName(
        way_tracker.select(
            F.lit("w").alias("mtype"), F.col("id").alias("ref"), "extract"
        )
    )
    kept_m = mem.join(
        trackers,
        (mem["m.type"] == trackers["mtype"]) & (mem["m.ref"] == trackers["ref"]),
    ).drop("mtype", "ref")
    clipped_rel_keys = (
        kept_m.groupBy("id", "version", "extract")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("pm")
        )
        .withColumn("members", F.col("pm.m"))
        .drop("pm")
    )
    out_rels = clipped_rel_keys.join(
        relations.drop("members"), ["id", "version"]
    ).select(*([F.col(c) for c in relations.columns] + [F.col("extract")]))

    return HardcutResult(nodes=out_nodes, ways=out_ways, relations=out_rels)
