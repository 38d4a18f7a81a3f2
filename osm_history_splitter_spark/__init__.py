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
