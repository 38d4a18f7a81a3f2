"""Douglas–Peucker polyline simplification, integer-exact, per-line.

Geometry *processing* counterpart to the engine's geometry *tests* (PIP,
clip): reduce each way/trajectory to the minimal vertex chain whose
deviation from the original stays ≤ ε — the standard pre-step before
rendering tiles or shipping extracted geometries downstream (the
reference leaves geometries untouched; osmium-based pipelines run
``ST_Simplify`` after the split — this is that stage, distributed).

Exactness: the keep/drop decision compares the perpendicular distance of
a point to the chord against ε. Both sides are squared and cross-
multiplied so the comparison is INTEGER-ONLY on integer (centidegree)
coordinates::

    dist > ε   ⇔   cross² > ε² · len²
    cross = (x2-x1)(y-y1) - (y2-y1)(x-x1),  len² = (x2-x1)² + (y2-y1)²

No float enters the decision, so results are bit-reproducible across
partitionings, Python versions, and the numpy/pure-Python twins used in
tests. Ties (dist == ε) DROP; among equal maxima the LOWEST index splits
— both choices pinned by tests.

Distribution: one ``applyInPandas`` keyed by line id. A line is a unit of
work (OSM ways are ≤ 2,000 nodes by API rule; web trajectories similar);
DP is inherently sequential along ONE line but embarrassingly parallel
across the 10⁹ lines of a planet-scale corpus — which is where the time
goes, so per-line sequentiality costs nothing. Arithmetic runs in int64
numpy; centidegree cross products top out ≈ 2.6e9, so cross² fits int64
with 20 bits to spare. If coordinates ever exceed that envelope the
batch falls back to arbitrary-precision ``object`` dtype for the argmax
(see ``_max_dev_idx``) instead of silently wrapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["dp_simplify_py", "simplify_lines", "simplify_ways"]

#: |cross| above this could overflow int64 when squared; centidegree
#: domains top out ~2.6e9, comfortably below
_INT64_SAFE = 3_000_000_000

#: int64 ceiling for the PRE-square intermediates (cross, d²) — the
#: overflow gate must fire BEFORE the first int64 multiply, from input
#: magnitudes alone, or the wrapped product can sneak under the guard
#: (a cross of exactly 2^64 wraps to 0 and a huge deviation is dropped)
_I64_MAX = 2**63 - 1


def _max_dev_idx(xs: np.ndarray, ys: np.ndarray) -> tuple[int, int, int]:
    """(index, cross², len²) of the max-deviation interior point vs the
    chord (first, last). For a degenerate chord (first == last) the
    deviation is the point distance to that point: returns (idx, d², 1).
    """
    x1, y1, x2, y2 = int(xs[0]), int(ys[0]), int(xs[-1]), int(ys[-1])
    dx, dy = x2 - x1, y2 - y1
    ix, iy = xs[1:-1], ys[1:-1]
    # exact-arithmetic gate, decided from INPUT magnitudes in Python ints
    # before any int64 product can wrap (see _I64_MAX note)
    mx = max(abs(int(ix.min()) - x1), abs(int(ix.max()) - x1))
    my = max(abs(int(iy.min()) - y1), abs(int(iy.max()) - y1))
    if dx == 0 and dy == 0:
        if mx * mx + my * my > _I64_MAX:
            ix, iy = ix.astype(object), iy.astype(object)
        d2 = (ix - x1) ** 2 + (iy - y1) ** 2
        j = int(np.argmax(d2))
        return j + 1, int(d2[j]), 1
    if abs(dx) * my + abs(dy) * mx > _I64_MAX:
        ix, iy = ix.astype(object), iy.astype(object)
    cross = dx * (iy - y1) - dy * (ix - x1)
    if np.abs(cross).max(initial=0) > _INT64_SAFE:
        cross = cross.astype(object)
    c2 = cross * cross
    j = int(np.argmax(c2))
    return j + 1, int(c2[j]), dx * dx + dy * dy


def dp_simplify_py(
    xs: np.ndarray, ys: np.ndarray, eps: int
) -> np.ndarray:
    """Boolean keep-mask for one polyline (iterative stack — no Python
    recursion limit on adversarial zigzags). Endpoints always kept."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    e2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        j, num, den = _max_dev_idx(xs[lo : hi + 1], ys[lo : hi + 1])
        # dist > eps  ⇔  cross² > eps²·len²  (ties DROP: strict >)
        if num > e2 * den:
            j += lo
            keep[j] = True
            stack.append((lo, j))
            stack.append((j, hi))
    return keep


def simplify_lines(
    lines: DataFrame, eps: int, id_col: str = "line_id"
) -> DataFrame:
    """Simplify ``(line_id, seq, x, y)`` polylines; returns the KEPT rows
    with the same schema (original ``seq`` preserved, so downstream can
    join back to per-vertex payloads). Integer coordinates required —
    see module docstring for why the decision is integer-exact."""
    schema = lines.schema
    for c in (id_col, "seq", "x", "y"):
        if c not in lines.columns:
            raise ValueError(f"simplify_lines needs column {c!r}")

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        mask = dp_simplify_py(
            pdf["x"].to_numpy(np.int64), pdf["y"].to_numpy(np.int64), eps
        )
        return pdf[mask]

    return lines.groupBy(id_col).applyInPandas(_one, schema)


def simplify_ways(
    nodes: DataFrame, ways: DataFrame, eps: int, res: int = 100
) -> DataFrame:
    """Simplify OSM way geometries: latest node versions give each way its
    vertex chain (centidegree ints at 1/``res`` degree), DP runs per way,
    and the surviving refs come back as ``(id, version, seq, ref)`` — a
    projection of the original ref list, order kept (the engine's way-clip
    contract, ``operators/hardcut.py``). Ways keep ≥ 2 refs by
    construction (endpoints always survive)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    latest = nodes.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("version").desc())
        ),
    ).filter("_rn = 1")
    coords = latest.select(
        F.col("id").alias("ref"),
        F.round(F.col("lon") * res).cast("long").alias("x"),
        F.round(F.col("lat") * res).cast("long").alias("y"),
    )
    verts = (
        ways.select(
            "id", "version", F.posexplode("refs").alias("seq", "ref")
        )
        .join(coords, "ref")
        .select(
            F.concat_ws("/", "id", "version").alias("line_id"),
            "id", "version", "seq", "ref", "x", "y",
        )
    )
    kept = simplify_lines(verts, eps)
    return kept.select("id", "version", "seq", "ref").sortWithinPartitions(
        "id", "version", "seq"
    )
