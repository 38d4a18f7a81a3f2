"""PySpark-native spatial splitter / tiling engine.

A from-scratch re-expression of the query semantics of
MaZderMind/osm-history-splitter (reference: /root/reference, C++ / osmium /
GEOS) as a distributed Spark DataFrame pipeline:

- **hardcut** (reference ``hardcut.hpp``): single-pass, version-local clipping.
  Nodes are kept iff inside an extract; ways are rebuilt keeping only tracked
  node refs (dropped below 2 refs); relations are rebuilt keeping only tracked
  node/way members (relation->relation refs never resolved).
- **softcut** (reference ``softcut.hpp``): dual-pass, history- and
  reference-complete. Membership is accumulated per object *id* (any version
  inside => all versions out), way node-sets are closed over all versions
  ("extra nodes"), and relation->relation references are resolved to a
  transitive closure.

The engine generalizes the versioned-entity model ``(id, version, point(s),
refs[])`` to Common-Crawl-style web pages (url = id, warc_ts = version,
geotags parsed from text), per the target north star.

Everything is built Spark-first: broadcast extract catalogs, grid cell-cover
candidate joins with exact point-in-polygon refinement in vectorized pandas
UDFs, distinct-membership marker tables instead of bitsets, and driver-side
fixpoint loops only for the (tiny) relation-closure graph.
"""

__version__ = "0.1.0"

# Public API surface: a user of the reference switching to this engine
# imports from here. Heavy modules load lazily (PEP 562) so a bare
# `import osm_history_splitter_spark` stays cheap.

_EXPORTS = {
    "run_split": "splitter",
    "incremental_resplit": "splitter",
    "compact_published": "splitter",
    "emit_osm_from_published": "splitter",
    "pass2_outputs": "splitter",
    "prepare_bucketed_world": "splitter",
    "hardcut": "operators.hardcut",
    "softcut": "operators.softcut",
    "assign_extracts": "operators.spatial_join",
    "Extract": "plans.catalog",
    "ExtractCatalog": "plans.catalog",
    "parse_config": "sources.config",
    "parse_config_dests": "sources.config",
    "parse_poly": "sources.poly",
    "parse_poly_multipolygon": "sources.poly",
    "load_osm_dataframes": "sources.osm_xml",
    "read_osm_elements_ranged": "sources.ingest",
    "read_pbf_elements": "sources.pbf",
    "load_pbf_dataframes": "sources.pbf",
    "write_extracts": "plans.io",
    "write_extracts_osm": "plans.osm_writer",
    "write_extracts_pbf": "plans.pbf_writer",
    "VersionedTable": "plans.table",
    "TableGroup": "plans.table",
    "stream_changes": "streaming.table_feed",
    "follow_into": "streaming.feed_consumer",
    "semdedup": "operators.semdedup",
    "within_distance_pairs": "operators.neighbors",
    "within_distance_join": "operators.neighbors",
    "knn_join": "operators.neighbors",
    "geodesic_pairs": "operators.neighbors",
    "geodesic_join": "operators.neighbors",
    "geodesic_knn_join": "operators.neighbors",
    "grid_dbscan_cells": "operators.neighbors",
    "simplify_lines": "operators.simplify",
    "simplify_ways": "operators.simplify",
    "quadtree_partitioner": "operators.partitioner",
    "QuadtreePartitioner": "operators.partitioner",
    "run_hierarchy": "plans.hierarchy",
    "fetch_and_split": "fetch",
    "get_spark": "session",
    "write_warc": "sources.warc",
    "read_warc": "sources.warc",
    "read_wet": "sources.warc",
    "read_pages": "sources.warc",
    "split_pages_to_warc": "sources.warc",
    "stream_crawl": "streaming.crawl_feed",
    "convex_overlay_join": "operators.overlay",
    "synth_pages": "sources.pages",
}

__all__ = ["__version__", *sorted(_EXPORTS)]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
