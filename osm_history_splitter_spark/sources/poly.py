"""Osmosis .poly file parser (reference ``geometryreader.hpp:130-275``).

Format: title line; then 1..n sections, each ``ring_name`` line (a ``!``
prefix marks a hole), coordinate lines ``lon lat`` (``%lE`` floats), ``END``
per ring; final ``END`` for the file. Rings are auto-closed if the last
vertex differs from the first (``geometryreader.hpp:204-207``).

The reference subtracts hole rings from the outer union via GEOS
difference (``geometryreader.hpp:256-274``). This engine's even-odd PIP
makes holes plain rings (crossing parity cancels them) — semantically
identical for VALID multipolygons (disjoint outers, holes nested in one
outer), verified by the hole tests in tests/test_geometry.py and
tests/test_sources.py.

KNOWN DIVERGENCE (documented, warned): when two OUTER rings overlap, GEOS
``union`` keeps the overlap region INSIDE, while even-odd parity cancels
it to OUTSIDE. Such .poly files are OGC-invalid but the reference still
processes them. The parser detects overlapping outers (vertex-containment
test behind a bbox prefilter) and emits a ``UserWarning`` naming the rings
— callers needing GEOS semantics must pre-union the outers. The same
parity rule applies to a hole straddling two outers (parity flips inside
both). tests/test_geometry.py pins the divergent behavior explicitly.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np

from ..functions.geometry import close_ring, points_in_rings

__all__ = ["parse_poly", "parse_poly_text"]


def _warn_overlapping_outers(outers: list[np.ndarray]) -> None:
    """Emit a UserWarning if any outer ring's vertex lies strictly inside
    another outer (the common overlap shape; crossing-without-contained-
    vertex overlaps escape this cheap test — hence 'detects', not
    'rejects'). Runs on the driver over catalog geometry only (tiny)."""
    for i, a in enumerate(outers):
        for j, b in enumerate(outers):
            if i == j:
                continue
            if (
                a[:, 0].min() > b[:, 0].max()
                or a[:, 0].max() < b[:, 0].min()
                or a[:, 1].min() > b[:, 1].max()
                or a[:, 1].max() < b[:, 1].min()
            ):
                continue
            if points_in_rings(a[:, 0], a[:, 1], [b]).any():
                warnings.warn(
                    f".poly outer rings {i} and {j} overlap: even-odd parity "
                    "treats the overlap as OUTSIDE, the reference (GEOS "
                    "union) keeps it INSIDE — pre-union the outers if you "
                    "need reference semantics",
                    UserWarning,
                    stacklevel=3,
                )
                return


def parse_poly_text(text: str) -> list[np.ndarray]:
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
            # ring header: name, optionally '!'-prefixed (hole). With
            # even-odd semantics the hole flag needs no special handling
            # for membership — it is only used to detect overlapping
            # OUTER rings (see module docstring).
            current = []
            current_hole = line.startswith("!")
            continue
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(f"bad coordinate line in .poly: {line!r}")
        current.append((float(parts[0]), float(parts[1])))
    if not rings:
        raise ValueError("no rings in .poly file")
    outers = [r for r, h in zip(rings, is_hole) if not h]
    if len(outers) > 1:
        _warn_overlapping_outers(outers)
    return rings


def parse_poly(path: str | Path) -> list[np.ndarray]:
    return parse_poly_text(Path(path).read_text())
