"""Pure-numpy computational geometry used by the engine.

The reference delegates point-in-polygon to GEOS
``IndexedPointInAreaLocator`` and keeps only **interior** points (reference
``cut.hpp:42-49``: ``Location == 0``; boundary and exterior are OUT). Shapely
/ GEOS is not available in this environment, so the engine carries its own
vectorized even-odd ray-casting with an explicit on-boundary test. Semantics:

- a multipolygon is a flat list of closed rings (lon/lat, first == last
  vertex); even-odd (crossing-parity) over *all* rings — holes are just rings,
  which matches GEOS interior semantics for valid polygons and the OSM-kind
  "every closed way is an outer" rule (reference ``geometryreader.hpp:26-29``).
- points exactly on any ring edge or vertex are NOT inside (boundary => OUT).

All hot-path functions are vectorized over numpy point arrays; the per-batch
cost is O(edges * points_in_batch) with edge loops in C via numpy. Polygons in
this workload are small catalogs (10s..1000s of vertices) broadcast to
executors, so this is the filter-*refine* step only — the grid cell-cover
prefilter (see :mod:`.grid`) keeps the candidate set small.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "close_ring",
    "rings_bbox",
    "points_in_rings",
    "points_on_boundary",
    "ring_signed_area",
]


def close_ring(ring: np.ndarray) -> np.ndarray:
    """Append the first vertex if the ring is not closed (reference
    ``geometryreader.hpp:204-207`` auto-close)."""
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] == 0:
        return ring.reshape(0, 2)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def rings_bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) envelope over all rings (reference
    ``cut.hpp:99-101`` uses the geometry envelope for writer metadata)."""
    allpts = np.vstack([np.asarray(r, dtype=np.float64) for r in rings])
    return (
        float(allpts[:, 0].min()),
        float(allpts[:, 1].min()),
        float(allpts[:, 0].max()),
        float(allpts[:, 1].max()),
    )


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (positive = CCW)."""
    r = close_ring(ring)
    x, y = r[:, 0], r[:, 1]
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def points_on_boundary(
    lon: np.ndarray, lat: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Boolean mask: point lies exactly on a ring edge or vertex.

    Exact float comparisons on purpose — this reproduces the knife-edge
    behavior of the GEOS locator for coordinates that are bit-identical to
    ring geometry (the row-for-row match criterion of the reference's strict
    predicates).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    on = np.zeros(lon.shape[0], dtype=bool)
    for ring in rings:
        r = close_ring(ring)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        for i in range(x1.shape[0]):
            a, b, c, d = x1[i], y1[i], x2[i], y2[i]
            cross = (c - a) * (lat - b) - (d - b) * (lon - a)
            within = (
                (lon >= min(a, c))
                & (lon <= max(a, c))
                & (lat >= min(b, d))
                & (lat <= max(b, d))
            )
            on |= (cross == 0.0) & within
    return on


def points_in_rings(
    lon: np.ndarray,
    lat: np.ndarray,
    rings: list[np.ndarray],
    boundary_is_inside: bool = False,
) -> np.ndarray:
    """Vectorized even-odd point-in-multipolygon, interior-only by default.

    Crossing test uses the half-open convention ``(y1 > p) != (y2 > p)`` so
    vertices on the ray are counted exactly once; this is the standard robust
    formulation (cf. W. R. Franklin's PNPOLY, public domain).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(lon.shape[0], dtype=bool)
    for ring in rings:
        r = close_ring(ring)
        if r.shape[0] < 4:  # degenerate (needs >= 3 distinct vertices)
            continue
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        # edges: loop over edges (small), vectorize over points (large)
        for i in range(x1.shape[0]):
            a, b, c, d = x1[i], y1[i], x2[i], y2[i]
            if b == d:
                continue  # horizontal edge never crosses the horizontal ray
            straddles = (b > lat) != (d > lat)
            if not straddles.any():
                continue
            # x coordinate where the edge crosses the point's latitude
            t = (lat - b) / (d - b)
            xi = a + t * (c - a)
            inside ^= straddles & (lon < xi)
    if not boundary_is_inside:
        onb = points_on_boundary(lon, lat, rings)
        inside &= ~onb
    else:
        onb = points_on_boundary(lon, lat, rings)
        inside |= onb
    return inside
