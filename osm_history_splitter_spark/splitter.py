"""Top-level split driver — the engine's analog of the reference CLI
(``splitter.cpp:25-98``): config → catalog → hardcut or softcut → per-extract
partitioned writes, resumable mid-split.

Run via spark-submit (north_rule)::

    spark-submit --py-files osm_history_splitter_spark.zip \
        -m osm_history_splitter_spark.splitter \
        --input /data/osm_tables --config extracts.config \
        --output /data/extracts --mode softcut

or programmatically: ``run_split(spark, nodes, ways, relations, catalog,
out_path, mode=...)``.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from .operators.hardcut import hardcut
from .operators.softcut import softcut_membership
from .plans.catalog import ExtractCatalog
from .plans.checkpoint import StageStore
from .plans.io import write_extracts
from .sources.config import parse_config

__all__ = ["run_split"]


def run_split(
    spark: SparkSession,
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog: ExtractCatalog,
    out_path: str,
    mode: str = "softcut",
    checkpoint_dir: str | None = None,
) -> dict:
    """Full split job; returns the combined lineage manifest.

    softcut runs as two phases with the four marker tables checkpointed
    between them (the resume point); hardcut is single-phase.
    """
    from .model import validate_history_compat

    for name, df in (("nodes", nodes), ("ways", ways), ("relations", relations)):
        validate_history_compat(df, name, expect_history=True)

    manifests = {}
    if mode == "hardcut":
        res = hardcut(nodes, ways, relations, catalog)
        manifests["nodes"] = write_extracts(
            res.nodes, f"{out_path}/nodes", "hardcut_nodes",
            sort_cols=["id", "version"], catalog=catalog,
        )
        manifests["ways"] = write_extracts(
            res.ways, f"{out_path}/ways", "hardcut_ways",
            sort_cols=["id", "version"], catalog=catalog,
        )
        manifests["relations"] = write_extracts(
            res.relations, f"{out_path}/relations", "hardcut_relations",
            sort_cols=["id", "version"], catalog=catalog,
        )
        return manifests

    if mode != "softcut":
        raise ValueError(f"unknown mode {mode!r} (softcut|hardcut)")

    store = StageStore(spark, checkpoint_dir or f"{out_path}/_checkpoints")

    def _compute_members():
        return softcut_membership(nodes, ways, relations, catalog, persist=True)

    # pass 1 with per-stage resume: each marker table is a checkpoint
    if all(
        store.has(n)
        for n in ("node_members", "way_members", "extra_nodes", "relation_members")
    ):
        node_members = store.load("node_members")
        way_members = store.load("way_members")
        extra_nodes = store.load("extra_nodes")
        relation_members = store.load("relation_members")
    else:
        m = _compute_members()
        node_members = store.get_or_compute("node_members", lambda: m.node_members)
        way_members = store.get_or_compute("way_members", lambda: m.way_members)
        extra_nodes = store.get_or_compute("extra_nodes", lambda: m.extra_nodes)
        relation_members = store.get_or_compute(
            "relation_members", lambda: m.relation_members
        )

    # pass 2: membership by id fans out to every version (history-complete)
    all_node_ids = node_members.unionByName(extra_nodes).distinct()
    manifests["nodes"] = write_extracts(
        nodes.join(all_node_ids, "id"), f"{out_path}/nodes", "softcut_nodes",
        sort_cols=["id", "version"], catalog=catalog,
    )
    manifests["ways"] = write_extracts(
        ways.join(way_members, "id"), f"{out_path}/ways", "softcut_ways",
        sort_cols=["id", "version"], catalog=catalog,
    )
    manifests["relations"] = write_extracts(
        relations.join(relation_members, "id"),
        f"{out_path}/relations", "softcut_relations",
        sort_cols=["id", "version"], catalog=catalog,
    )
    manifests["checkpoints"] = store.manifest()
    return manifests


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="dir with nodes/ways/relations parquet")
    ap.add_argument("--config", required=True, help="split config file")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", default="softcut", choices=["softcut", "hardcut"])
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    from .session import get_spark

    spark = get_spark("splitter")
    catalog = parse_config(args.config)
    nodes = spark.read.parquet(f"{args.input}/nodes")
    ways = spark.read.parquet(f"{args.input}/ways")
    relations = spark.read.parquet(f"{args.input}/relations")
    manifest = run_split(
        spark, nodes, ways, relations, catalog, args.output,
        mode=args.mode, checkpoint_dir=args.checkpoint_dir,
    )
    import json

    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
