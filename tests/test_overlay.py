"""Convex overlay intersection (operators/overlay.py): analytic
fixtures, an INDEPENDENT exact construction (hull of vertex/crossing
candidates) as differential, and the distributed join vs the kernel."""

from __future__ import annotations

import random
from fractions import Fraction

from osm_history_splitter_spark.operators.hull import monotone_chain as _mc
from osm_history_splitter_spark.operators.overlay import (
    clip_convex,
    convex_overlay_join,
    polygon_area2,
)


def monotone_chain(points):
    """operators/hull.py's exact hull, adapted to bare (x, y) points
    (it expects (x, y, id) triples)."""
    return [(x, y) for x, y, _ in _mc([(x, y, 0) for x, y in points])]


def _area2(ring):
    a = abs(polygon_area2(ring)) if len(ring) >= 3 else Fraction(0)
    return a


def _inside_closed(p, ring):
    """p in closed convex ring (CCW)."""
    n = len(ring)
    px, py = Fraction(p[0]), Fraction(p[1])
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        cr = (Fraction(bx) - ax) * (py - ay) - (Fraction(by) - ay) * (px - ax)
        if cr < 0:
            return False
    return True


def _seg_inter(p, q, r, s):
    """All intersection points of closed segments pq and rs (0, 1, or
    endpoints of the shared collinear range), exact."""
    px, py, qx, qy = map(Fraction, (*p, *q))
    rx, ry, sx, sy = map(Fraction, (*r, *s))
    d = (qx - px) * (sy - ry) - (qy - py) * (sx - rx)
    out = []
    if d != 0:
        t = ((rx - px) * (sy - ry) - (ry - py) * (sx - rx)) / d
        u = ((rx - px) * (qy - py) - (ry - py) * (qx - px)) / d
        if 0 <= t <= 1 and 0 <= u <= 1:
            out.append((px + t * (qx - px), py + t * (qy - py)))
    else:
        # collinear overlap: project endpoints onto pq
        cr = (qx - px) * (ry - py) - (qy - py) * (rx - px)
        if cr == 0:
            for c in (r, s):
                cx, cy = Fraction(c[0]), Fraction(c[1])
                dot = (cx - px) * (qx - px) + (cy - py) * (qy - py)
                ln = (qx - px) ** 2 + (qy - py) ** 2
                if 0 <= dot <= ln:
                    out.append((cx, cy))
    return out


def independent_area2(A, B):
    """Exact intersection area² via a construction independent of
    Sutherland–Hodgman: candidate points = A-vertices inside B,
    B-vertices inside A, all edge crossings; hull; shoelace."""
    A = A if polygon_area2(A) >= 0 else A[::-1]
    B = B if polygon_area2(B) >= 0 else B[::-1]
    pts = [
        (Fraction(x), Fraction(y)) for x, y in A if _inside_closed((x, y), B)
    ] + [
        (Fraction(x), Fraction(y)) for x, y in B if _inside_closed((x, y), A)
    ]
    n, m = len(A), len(B)
    for i in range(n):
        for j in range(m):
            pts.extend(
                _seg_inter(A[i], A[(i + 1) % n], B[j], B[(j + 1) % m])
            )
    hull = monotone_chain(pts)
    return _area2(hull)


def _rand_convex(rng, cx, cy, r, k=7):
    pts = {
        (cx + rng.randint(-r, r), cy + rng.randint(-r, r)) for _ in range(k)
    }
    return monotone_chain(sorted(pts))


SQ = lambda x0, y0, s: [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]  # noqa: E731


def test_analytic_fixtures():
    # half-overlapping unit squares: [1,2]x[1,2] area 1 (area2 = 2)
    assert _area2(clip_convex(SQ(0, 0, 2), SQ(1, 1, 2))) == 2
    # containment: inner square wins
    assert _area2(clip_convex(SQ(0, 0, 10), SQ(2, 2, 3))) == 18
    assert _area2(clip_convex(SQ(2, 2, 3), SQ(0, 0, 10))) == 18
    # disjoint and edge-touch: zero
    assert _area2(clip_convex(SQ(0, 0, 2), SQ(5, 5, 2))) == 0
    assert _area2(clip_convex(SQ(0, 0, 2), SQ(2, 0, 2))) == 0
    # rational crossing: triangles -> area2 is a genuine fraction
    t1 = [(0, 0), (4, 0), (0, 4)]
    t2 = [(1, 1), (5, 1), (5, 5)]
    got = _area2(clip_convex(t1, t2))
    assert got == independent_area2(t1, t2) and got > 0
    # orientation independence
    assert _area2(clip_convex(t1[::-1], t2)) == got
    assert _area2(clip_convex(t1, t2[::-1])) == got


def test_differential_vs_independent_construction():
    rng = random.Random(20260818)
    pairs = checked = 0
    while checked < 60:
        A = _rand_convex(rng, rng.randint(5, 40), rng.randint(5, 40), 12)
        B = _rand_convex(rng, rng.randint(5, 40), rng.randint(5, 40), 12)
        if len(A) < 3 or len(B) < 3:
            continue
        checked += 1
        sh = _area2(clip_convex(A, B))
        ind = independent_area2(A, B)
        assert sh == ind, (A, B, sh, ind)
        if sh > 0:
            pairs += 1
    assert pairs >= 10  # the sample genuinely exercises overlaps


def test_distributed_join_equals_kernel(spark):
    rng = random.Random(7)
    polys = []
    gid = 0
    for _ in range(40):
        p = _rand_convex(rng, rng.randint(10, 120), rng.randint(10, 120), 15)
        if len(p) >= 3:
            polys.append((gid, [x for x, _ in p], [y for _, y in p]))
            gid += 1
    df = spark.createDataFrame(
        polys, "gid long, xs array<long>, ys array<long>"
    )
    got = {
        (r["gid_a"], r["gid_b"]): Fraction(
            int(r["area2_num"]), int(r["area2_den"])
        )
        for r in convex_overlay_join(df, df, cell=32).collect()
    }
    want = {}
    rings = {g: list(zip(xs, ys)) for g, xs, ys in polys}
    for ga, ra in rings.items():
        for gb, rb in rings.items():
            a2 = _area2(clip_convex(ra, rb))
            if a2 > 0:
                want[(ga, gb)] = a2
    assert got == want
    # self-pairs report the polygon's own area
    for g, ring in rings.items():
        assert got[(g, g)] == _area2(ring)
