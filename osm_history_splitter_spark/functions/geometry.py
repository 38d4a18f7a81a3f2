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
    "points_in_rings_winding",
    "points_on_boundary",
    "ring_signed_area",
    "ring_wraps_antimeridian",
    "ring_winds_globe",
    "unwrap_ring",
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


def ring_wraps_antimeridian(ring: np.ndarray) -> bool:
    """True iff any (closed-ring) edge jumps more than 180° of longitude —
    the normalized-coordinate signature of a ring crossing the antimeridian
    (or winding the globe around a pole)."""
    r = close_ring(ring)
    if r.shape[0] < 2:
        return False
    return bool(np.abs(np.diff(r[:, 0])).max() > 180.0)


def unwrap_ring(ring: np.ndarray) -> np.ndarray:
    """Rewrite ring longitudes as a continuous sequence (each step takes the
    ±360-shifted image closest to its predecessor). A ring that merely
    crosses the antimeridian comes back to its starting longitude; a ring
    that winds the globe (polar cap) ends ±360 away.

    EXACT by construction: each vertex gets ``lon + 360·k`` for an
    integer wrap count ``k`` (one floating add of an exact multiple of
    360) — never a re-accumulated cumsum of diffs. A non-wrapping ring
    therefore comes back BIT-IDENTICAL, and a wrapped vertex matches the
    same computation a point image ``lon + shift`` performs, so the
    exact on-boundary test keeps its knife-edge row-for-row behavior.
    """
    r = close_ring(ring).copy()
    d = np.diff(r[:, 0])
    k = np.concatenate([[0.0], np.cumsum(-np.round(d / 360.0))])
    r[:, 0] = r[:, 0] + 360.0 * k
    return r


def ring_winds_globe(ring: np.ndarray) -> float:
    """Total longitude winding of the closed ring: ~±360 for a polar cap,
    ~0 otherwise. Computed on the unwrapped ring."""
    r = unwrap_ring(ring)
    return float(r[-1, 0] - r[0, 0])


def _ring_even_odd(
    lon: np.ndarray, lat: np.ndarray, r: np.ndarray
) -> np.ndarray:
    """Planar even-odd crossing test of each point against ONE closed
    ring ``r`` — the PNPOLY half-open formulation shared by the planar
    multipolygon path and the winding fallback's planar-ring branch."""
    ring_in = np.zeros(lon.shape[0], dtype=bool)
    x1, y1 = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
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
        ring_in ^= straddles & (lon < xi)
    return ring_in


def _has_pole_edge(r: np.ndarray) -> bool:
    """True iff any edge of the CLOSED ring lies on a pole line (both
    endpoint latitudes equal ±90) — the signature of an explicitly
    planar-encoded polar polygon (e.g. an antarctica.poly with its
    literal lat=-90 bottom edge), as opposed to a bare circumpolar rim."""
    y1, y2 = r[:-1, 1], r[1:, 1]
    return bool(np.any((y1 == y2) & (np.abs(y1) == 90.0)))


def _winding_number(
    lon: np.ndarray, lat: np.ndarray, r: np.ndarray
) -> np.ndarray:
    """Vectorized Sunday winding number of each point w.r.t. ONE closed ring
    (r already closed; loop over edges, vectorize over points)."""
    wn = np.zeros(lon.shape[0], dtype=np.int64)
    x1, y1 = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    for i in range(x1.shape[0]):
        a, b, c, d = x1[i], y1[i], x2[i], y2[i]
        if b == d:
            continue
        isleft = (c - a) * (lat - b) - (d - b) * (lon - a)
        if d > b:  # upward edge: counts when the point is strictly left
            wn += ((b <= lat) & (d > lat) & (isleft > 0)).astype(np.int64)
        else:  # downward edge: counts when the point is strictly right
            wn -= ((d <= lat) & (b > lat) & (isleft < 0)).astype(np.int64)
    return wn


def points_in_rings_winding(
    lon: np.ndarray,
    lat: np.ndarray,
    rings: list[np.ndarray],
    boundary_is_inside: bool = False,
    holes: list[bool] | None = None,
) -> np.ndarray:
    """Winding-number point-in-multipolygon, safe for rings that cross the
    antimeridian or enclose a pole (the fallback path the planar even-odd
    test cannot express; reference semantics otherwise identical —
    interior-only, boundary ⇒ OUT).

    Per ring: longitudes are unwrapped into a continuous sequence; a ring
    whose total winding is ±360 encloses a pole and is closed through the
    pole nearer its mean latitude; each point is tested at its three
    longitude images (lon, lon±360) so it can land inside the unwrapped
    ring's span. Within a ring the nonzero-winding rule decides (identical
    to even-odd for simple rings); across rings the composition is the
    same as :func:`points_in_rings`: parity (XOR) when ``holes`` is None,
    GEOS-union (OR outers, minus OR holes) when ``holes`` flags are given.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(lon.shape[0], dtype=bool)
    in_hole = np.zeros(lon.shape[0], dtype=bool)
    onb = np.zeros(lon.shape[0], dtype=bool)
    for ring_idx, ring in enumerate(rings):
        raw = close_ring(ring)
        if raw.shape[0] < 4:
            continue
        if not ring_wraps_antimeridian(raw) or _has_pole_edge(raw):
            # planar-encoded ring: (a) a non-wrapping ring that only
            # landed here because a SIBLING ring wraps — it must get the
            # bit-identical planar test, raw coordinates, no ±360 point
            # images; (b) a polar polygon with an explicit pole edge
            # (antarctica.poly's literal lat=-90 bottom): its seam/pole
            # edges ARE the encoded boundary, and the unwrap would erase
            # the 360° bottom jump and misread it as a bare rim of the
            # OPPOSITE cap (membership inverted for the whole planet).
            ring_in = _ring_even_odd(lon, lat, raw)
            ring_on = points_on_boundary(lon, lat, [raw])
            if holes is None:
                inside ^= ring_in
            elif holes[ring_idx]:
                in_hole |= ring_in
            else:
                inside |= ring_in
            onb |= ring_on
            continue
        rim = unwrap_ring(raw)
        r = rim
        at_pole = None
        wind = r[-1, 0] - r[0, 0]
        if abs(wind) > 180.0:  # winds the globe → encloses a pole
            # which pole is enclosed is NOT derivable from the rim's
            # position (a cap and its complement share the same rim):
            # the interior-on-the-LEFT orientation convention decides —
            # eastward winding (+360) encloses the north pole, westward
            # the south. A rim at lat -60 travelling east is "the world
            # minus Antarctica", not the Antarctic cap (a mean-latitude
            # heuristic would invert every point of that polygon).
            pole = 90.0 if wind > 0.0 else -90.0
            # close through the pole for the winding test only — the seam
            # and polar edges are artifacts, NOT polygon boundary (a point
            # on the seam longitude is interior, and the pole itself is
            # interior); the true boundary is the rim alone.
            r = np.vstack(
                [
                    rim,
                    [[rim[-1, 0], pole]],
                    [[rim[0, 0], pole]],
                    [[rim[0, 0], rim[0, 1]]],
                ]
            )
            at_pole = lat == pole
        ring_in = np.zeros(lon.shape[0], dtype=bool)
        ring_on = np.zeros(lon.shape[0], dtype=bool)
        for shift in (-360.0, 0.0, 360.0):
            x = lon + shift
            ring_in |= _winding_number(x, lat, r) != 0
            ring_on |= points_on_boundary(x, lat, [rim])
        if at_pole is not None:
            ring_in |= at_pole
        if holes is None:
            inside ^= ring_in
        elif holes[ring_idx]:
            in_hole |= ring_in
        else:
            inside |= ring_in
        onb |= ring_on
    if holes is not None:
        inside &= ~in_hole
    if boundary_is_inside:
        return inside | onb
    return inside & ~onb


def points_in_rings(
    lon: np.ndarray,
    lat: np.ndarray,
    rings: list[np.ndarray],
    boundary_is_inside: bool = False,
    holes: list[bool] | None = None,
) -> np.ndarray:
    """Vectorized even-odd point-in-multipolygon, interior-only by default.

    Crossing test uses the half-open convention ``(y1 > p) != (y2 > p)`` so
    vertices on the ray are counted exactly once; this is the standard robust
    formulation (cf. W. R. Franklin's PNPOLY, public domain).

    Ring composition: with ``holes`` None, even-odd parity ACROSS rings
    (nested holes cancel — correct for valid multipolygons). With
    ``holes`` (one flag per ring), reference GEOS-union semantics
    (``geometryreader.hpp:256-274``: outers unioned, then holes
    differenced): inside = even-odd inside ANY outer ring, and not inside
    any hole ring. For a VALID multipolygon (disjoint outers, each hole
    nested in one outer) the two compositions agree; they differ exactly
    where outers OVERLAP (e.g. the reference's ``europe/serbia.poly``),
    where union keeps the overlap INSIDE but parity would cancel it.

    Rings that cross the antimeridian or enclose a pole (any closed-ring
    edge jumping >180° of longitude) route to the winding-number fallback
    :func:`points_in_rings_winding` — planar ray casting on normalized
    coordinates is wrong for them.
    """
    if any(ring_wraps_antimeridian(r) for r in rings):
        return points_in_rings_winding(
            lon, lat, rings, boundary_is_inside=boundary_is_inside,
            holes=holes,
        )
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(lon.shape[0], dtype=bool)
    in_hole = np.zeros(lon.shape[0], dtype=bool)
    for ring_idx, ring in enumerate(rings):
        r = close_ring(ring)
        if r.shape[0] < 4:  # degenerate (needs >= 3 distinct vertices)
            continue
        # edges: loop over edges (small), vectorize over points (large)
        ring_in = _ring_even_odd(lon, lat, r)
        if holes is None:
            inside ^= ring_in
        elif holes[ring_idx]:
            in_hole |= ring_in
        else:
            inside |= ring_in
    if holes is not None:
        inside &= ~in_hole
    if not boundary_is_inside:
        # boundary ⇒ OUT can only FLIP points currently inside: run the
        # exact O(edges × points) boundary pass on that (usually small)
        # subset only — halves the Python edge-loop cost of the exact-PIP
        # refine hot path, identical results
        idx = np.nonzero(inside)[0]
        if idx.size:
            onb_sub = points_on_boundary(lon[idx], lat[idx], rings)
            inside[idx[onb_sub]] = False
    else:
        inside |= points_on_boundary(lon, lat, rings)
    return inside
