"""Osmosis .poly file parser (reference ``geometryreader.hpp:130-275``).

Format: title line; then 1..n sections, each ``ring_name`` line (a ``!``
prefix marks a hole), coordinate lines ``lon lat`` (``%lE`` floats), ``END``
per ring; final ``END`` for the file. Rings are auto-closed if the last
vertex differs from the first (``geometryreader.hpp:204-207``).

The reference subtracts hole rings from the outer union via GEOS
difference (``geometryreader.hpp:256-274``). The parser therefore keeps
the per-ring hole flag (``!``-prefixed section names) and returns it from
:func:`parse_poly_multipolygon`; membership downstream composes rings
with the reference's union semantics — even-odd inside ANY outer ring,
minus any hole ring (``functions.geometry.points_in_rings(holes=...)``).
For valid multipolygons this equals plain even-odd parity; where OUTER
rings overlap (the reference's own ``clipbounds/europe/serbia.poly``)
the union keeps the overlap INSIDE, matching GEOS.

:func:`parse_poly` (flat ring list, no hole flags) remains for callers
that only need geometry extent; membership through it is parity-based,
so prefer the multipolygon variant for reference-exact predicates.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..functions.geometry import close_ring

__all__ = ["parse_poly", "parse_poly_multipolygon", "parse_poly_text"]


def parse_poly_multipolygon_text(
    text: str,
) -> tuple[list[np.ndarray], list[bool]]:
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty .poly file")
    rings: list[np.ndarray] = []
    is_hole: list[bool] = []
    i = 1  # skip title line (geometryreader.hpp reads and discards it)
    current: list[tuple[float, float]] | None = None
    current_hole = False
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        if line == "END":
            if current is not None:
                if len(current) >= 3:
                    rings.append(close_ring(np.asarray(current, dtype=np.float64)))
                    is_hole.append(current_hole)
                current = None
            else:
                break  # file-level END
            continue
        if current is None:
            # ring header: name, optionally '!'-prefixed (hole) —
            # geometryreader.hpp:198-200
            current = []
            current_hole = line.startswith("!")
            continue
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(f"bad coordinate line in .poly: {line!r}")
        current.append((float(parts[0]), float(parts[1])))
    if current is not None and current:
        # a ring whose END never arrived (file cut off mid-transfer):
        # dropping it would silently shrink the extract's geometry
        raise ValueError(
            "truncated .poly: last ring has coordinates but no END"
        )
    if not rings:
        raise ValueError("no rings in .poly file")
    return rings, is_hole


def parse_poly_multipolygon(
    path: str | Path,
) -> tuple[list[np.ndarray], list[bool]]:
    """(closed rings, per-ring hole flag) — the reference-exact form."""
    return parse_poly_multipolygon_text(Path(path).read_text())


def parse_poly_text(text: str) -> list[np.ndarray]:
    """Flat ring list (hole flags dropped) — extent/compat use only."""
    return parse_poly_multipolygon_text(text)[0]


def parse_poly(path: str | Path) -> list[np.ndarray]:
    return parse_poly_text(Path(path).read_text())
