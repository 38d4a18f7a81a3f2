"""Osmosis .poly file parser (reference ``geometryreader.hpp:130-275``).

Format: title line; then 1..n sections, each ``ring_name`` line (a ``!``
prefix marks a hole), coordinate lines ``lon lat`` (``%lE`` floats), ``END``
per ring; final ``END`` for the file. Rings are auto-closed if the last
vertex differs from the first (``geometryreader.hpp:204-207``).

The reference subtracts hole rings from the outer union via GEOS difference
(``geometryreader.hpp:256-274``). This engine's even-odd PIP makes holes
plain rings (crossing parity cancels them), so the parser returns the flat
ring list — semantically identical for valid inputs, verified by the hole
tests in tests/test_geometry.py and tests/test_sources.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..functions.geometry import close_ring

__all__ = ["parse_poly", "parse_poly_text"]


def parse_poly_text(text: str) -> list[np.ndarray]:
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty .poly file")
    rings: list[np.ndarray] = []
    i = 1  # skip title line (geometryreader.hpp reads and discards it)
    current: list[tuple[float, float]] | None = None
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        if line == "END":
            if current is not None:
                if len(current) >= 3:
                    rings.append(close_ring(np.asarray(current, dtype=np.float64)))
                current = None
            else:
                break  # file-level END
            continue
        if current is None:
            # ring header: name, optionally '!'-prefixed (hole). With
            # even-odd semantics the hole flag needs no special handling.
            current = []
            continue
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(f"bad coordinate line in .poly: {line!r}")
        current.append((float(parts[0]), float(parts[1])))
    if not rings:
        raise ValueError("no rings in .poly file")
    return rings


def parse_poly(path: str | Path) -> list[np.ndarray]:
    return parse_poly_text(Path(path).read_text())
