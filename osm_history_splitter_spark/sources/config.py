"""Split config parser (reference ``readConfig``, ``splitter.cpp:101-184``).

Line format: ``dest  TYPE  spec`` where TYPE ∈ {BBOX, POLY, OSM}; ``#``
comments and blank lines are skipped (``splitter.cpp:113-114``). BBOX spec is
``minlon,minlat,maxlon,maxlat`` (the reference's double argument swap at
``splitter.cpp:147-148`` vs ``cut.hpp:71-77`` cancels out — net standard
order; see SURVEY.md P3). POLY/OSM specs are file paths, resolved relative
to the config file's directory.
"""

from __future__ import annotations

from pathlib import Path

from ..plans.catalog import Extract, ExtractCatalog
from .osm_xml import rings_from_osm_file
from .poly import parse_poly_multipolygon

__all__ = ["parse_config", "parse_config_text"]


def _extract_name(dest: str) -> str:
    """Output file name → extract/partition name (strip dirs + extensions)."""
    name = Path(dest).name
    for ext in (".pbf", ".bz2", ".gz", ".osm", ".osh"):
        if name.endswith(ext):
            name = name[: -len(ext)]
    return name


def parse_config_text(text: str, base_dir: str | Path = ".") -> ExtractCatalog:
    base = Path(base_dir)
    catalog = ExtractCatalog()
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) != 3:
            raise ValueError(f"config line {lineno}: expected 3 fields: {raw!r}")
        dest, kind, spec = parts
        kind = kind.upper()
        name = _extract_name(dest)
        if kind == "BBOX":
            vals = [float(x) for x in spec.split(",")]
            if len(vals) != 4:
                raise ValueError(f"config line {lineno}: bbox needs 4 floats")
            catalog.add(Extract.bbox(name, *vals))
        elif kind == "POLY":
            rings, holes = parse_poly_multipolygon(base / spec)
            catalog.add(Extract.poly(name, rings, kind="POLY", holes=holes))
        elif kind == "OSM":
            # every closed way is an OUTER polygon of one multipolygon
            # (geometryreader.hpp:75-81,95-102: no role handling, nested
            # rings are NOT holes) — all-outer flags select the same
            # union composition the reference's GEOS locator applies
            rings = rings_from_osm_file(base / spec)
            catalog.add(
                Extract.poly(
                    name, rings, kind="OSM", holes=[False] * len(rings)
                )
            )
        else:
            raise ValueError(f"config line {lineno}: unknown type {kind!r}")
    return catalog


def parse_config(path: str | Path) -> ExtractCatalog:
    p = Path(path)
    return parse_config_text(p.read_text(), base_dir=p.parent)


def parse_config_dests(path: str | Path) -> dict[str, str]:
    """Extract name → configured output file path (the ``dest`` field the
    catalog strips) — feeds the reference-format sinks so the emitted
    file keeps the config's extension-selected format AND its relative
    directory layout (the reference cron driver creates one dir per dest
    dirname, ``fetch-and-split.php:97-107``). Paths are re-rooted under
    the job's output dir: absolute dests and ``..`` segments fall back
    to the bare file name."""
    dests = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) == 3:
            p = Path(parts[0])
            rel = p.name if (p.is_absolute() or ".." in p.parts) else str(p)
            dests[_extract_name(parts[0])] = rel
    return dests
