"""J7 — clipbounds-hierarchy orchestration (reference
``tools/split-all-clipbounds.py:18-26,79-88``): a directory tree of
geometry files where ``europe/germany.poly`` is cut from the ``europe``
extract rather than the planet.

Because extract membership is purely geometric and softcut closures only
ever *add* objects referenced by in-extract hits, splitting a child from
its parent's output equals splitting it from the planet (child geometry ⊆
parent geometry ⇒ child hits ⊆ parent hits ⇒ identical markers). The
engine therefore supports both strategies:

- **one-pass**: load every level into one catalog (path-qualified names)
  and assign all extracts in a single membership job — the scan-once
  design, preferred at scale;
- **staged**: ``topo_batches()`` yields depth-ordered batches for the
  reference-style sequence of jobs where each child reads its parent's
  (much smaller) output — preferred when the planet scan dominates and
  children are rerun often.

Equivalence of the two strategies is asserted in
tests/test_hierarchy.py.
"""

from __future__ import annotations

from pathlib import Path

from ..sources.osm_xml import rings_from_osm_file
from ..sources.poly import parse_poly_multipolygon
from .catalog import Extract, ExtractCatalog

__all__ = [
    "load_clipbounds_tree",
    "topo_batches",
    "parent_of",
    "run_hierarchy",
]


def load_clipbounds_tree(
    root: str | Path, skip: tuple[str, ...] = ()
) -> ExtractCatalog:
    """Scan a clipbounds directory recursively; every ``.poly``/``.osm``
    becomes an extract named by its relative path (sans extension)."""
    root = Path(root)
    catalog = ExtractCatalog()
    for p in sorted(root.rglob("*")):
        if p.suffix not in (".poly", ".osm") or any(s in p.parts for s in skip):
            continue
        name = str(p.relative_to(root).with_suffix(""))
        try:
            if p.suffix == ".poly":
                rings, holes = parse_poly_multipolygon(p)
            else:
                # OSM geometry files: every closed way is an OUTER ring
                # (no roles in the reference reader) — union composition
                rings = rings_from_osm_file(p)
                holes = [False] * len(rings)
        except ValueError:
            continue  # empty/degenerate geometry file
        catalog.add(
            Extract.poly(
                name, rings,
                kind="POLY" if p.suffix == ".poly" else "OSM",
                holes=holes,
            )
        )
    return catalog


def parent_of(name: str) -> str | None:
    """europe/germany/bayern -> europe/germany (the reference re-queues a
    child until its parent extract is finished)."""
    parts = name.rsplit("/", 1)
    return parts[0] if len(parts) == 2 else None


def topo_batches(catalog: ExtractCatalog) -> list[list[str]]:
    """Depth-ordered batches: batch i may only read outputs of batches <i.
    Mirrors the directory grouping of the reference orchestrator."""
    by_depth: dict[int, list[str]] = {}
    for e in catalog:
        by_depth.setdefault(e.name.count("/"), []).append(e.name)
    return [sorted(by_depth[d]) for d in sorted(by_depth)]


def run_hierarchy(
    spark,
    nodes,
    ways,
    relations,
    tree: ExtractCatalog,
    out_root: str,
    mode: str = "softcut",
) -> dict:
    """Staged execution of a clipbounds tree (reference
    ``tools/split-all-clipbounds.py:60-101``): children split FROM THEIR
    PARENT'S WRITTEN OUTPUT, never from the planet, with parent-before-child
    scheduling guaranteed by ``topo_batches``.

    The reference groups all tasks sharing a source into one splitter
    invocation (one scan feeds all siblings, re-queuing children whose
    parent isn't finished). Here a topo batch plays the queue's role and
    each (source -> children) group runs as ONE split job: the parent
    output is read once and all its children are assigned in that single
    membership job, mirroring the shared-scan design
    (``splitter.cpp:80``).

    Layout: the job sourced from extract S writes to
    ``{out_root}/jobs/{S}``; root-sourced jobs write to
    ``{out_root}/jobs/_root.d{depth}`` — **depth-unique**, because extracts
    whose parent *directory* has no geometry file (e.g. the reference tree's
    ``europe/great_britain/england/london/enfield`` where ``london`` has no
    .poly) also source from the root, in a LATER batch; sharing one ``_root``
    dir would let that later overwrite-mode job clobber the depth-0 job's
    output. A child's rows are read back from the dir its job actually wrote
    (tracked in ``written_at``), with partition pruning (``read_extract``).
    Returns a manifest whose ``jobs`` list proves the ordering (each entry
    names its source job, which always appears earlier).
    """
    from ..splitter import run_split
    from .io import parquet_dir_has_data, read_extract

    names = {e.name for e in tree}
    by_name = {e.name: e for e in tree}
    manifest: dict = {"mode": mode, "jobs": []}
    done: set[str] = set()
    written_at: dict[str, str] = {}  # extract name -> dir of the job that wrote it

    for depth, batch in enumerate(topo_batches(tree)):
        groups: dict[str | None, list[str]] = {}
        for n in batch:
            p = parent_of(n)
            src = p if (p is not None and p in names) else None
            groups.setdefault(src, []).append(n)
        for src in sorted(groups, key=lambda s: (s is not None, s or "")):
            children = sorted(groups[src])
            if src is None:
                src_nodes, src_ways, src_rels = nodes, ways, relations
                job_src = f"_root.d{depth}"
            else:
                assert src in done, f"scheduling bug: {src} not finished"
                base = written_at[src]

                def _part(sub, fallback):
                    # an all-empty parent write leaves no parquet files ->
                    # schema inference would fail; substitute an empty
                    # frame of the root schema (same columns flow through
                    # the split). ONLY that case — existence is checked
                    # up front so any other read failure (corrupt
                    # parquet) still surfaces, and the expected-missing
                    # path never fires a failed-analysis event at the
                    # session's Observation listeners.
                    if not parquet_dir_has_data(spark, f"{base}/{sub}"):
                        return spark.createDataFrame([], fallback.schema)
                    return read_extract(spark, f"{base}/{sub}", src).drop(
                        "extract"
                    )

                src_nodes = _part("nodes", nodes)
                src_ways = _part("ways", ways)
                src_rels = _part("relations", relations)
                job_src = src
            cat = ExtractCatalog([by_name[c] for c in children])
            job_out = f"{out_root}/jobs/{job_src}"
            m = run_split(
                spark, src_nodes, src_ways, src_rels, cat, job_out, mode=mode
            )
            manifest["jobs"].append(
                {"source": job_src, "children": children, "out": job_out,
                 "rows": {k: v.get("rows") for k, v in m.items() if isinstance(v, dict)}}
            )
            done.update(children)
            written_at.update({c: job_out for c in children})
    return manifest
