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
from ..sources.poly import parse_poly
from .catalog import Extract, ExtractCatalog

__all__ = ["load_clipbounds_tree", "topo_batches", "parent_of"]


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
                rings = parse_poly(p)
            else:
                rings = rings_from_osm_file(p)
        except ValueError:
            continue  # empty/degenerate geometry file
        catalog.add(Extract.poly(name, rings, kind="POLY" if p.suffix == ".poly" else "OSM"))
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
