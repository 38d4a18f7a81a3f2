"""points_near_segments: brute-force differential, the three predicate
cases (endpoint A / interior / endpoint B) incl. exact-ε boundary and
degenerate segments, exactly-once emission, cell-size invariance, and
plan shape (one hash equi-join, never a CartesianProduct)."""

from __future__ import annotations

import math
import random

import pytest

from fractions import Fraction

from osm_history_splitter_spark.operators.ptseg import (
    points_near_segments,
    snap_to_segments,
)


def _ref_within(p, s, eps):
    """Float reference with an exact-integer tie path: distances here
    are compared squared, and every squared distance of integer inputs
    is integer (endpoint cases) or rational with integer cross-mult
    (interior) — mirror the operator's arithmetic exactly."""
    px, py = p
    x1, y1, x2, y2 = s
    abx, aby = x2 - x1, y2 - y1
    apx, apy = px - x1, py - y1
    dot = apx * abx + apy * aby
    l2 = abx * abx + aby * aby
    e2 = eps * eps
    if dot <= 0:
        return apx * apx + apy * apy <= e2
    if dot >= l2:
        bpx, bpy = px - x2, py - y2
        return bpx * bpx + bpy * bpy <= e2
    cross = abx * apy - aby * apx
    return cross * cross <= e2 * l2


PT_SCHEMA = "id long, x long, y long"
SEG_SCHEMA = "id long, x1 long, y1 long, x2 long, y2 long"


def _pairs(spark, pts, segs, eps, cell):
    pdf = spark.createDataFrame(pts, PT_SCHEMA)
    sdf = spark.createDataFrame(segs, SEG_SCHEMA)
    rows = points_near_segments(pdf, sdf, eps, cell).collect()
    got = [(r["id_p"], r["id_s"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    return set(got)


CASES = [
    # (point, segment, eps, within?)
    ((5, 3), (0, 0, 10, 0), 3, True),  # interior, exactly ε (inclusive)
    ((5, 4), (0, 0, 10, 0), 3, False),  # interior, ε+1
    ((-3, 4), (0, 0, 10, 0), 5, True),  # endpoint A governs, exactly ε
    ((13, 4), (0, 0, 10, 0), 5, True),  # endpoint B governs, exactly ε
    ((13, 5), (0, 0, 10, 0), 5, False),  # past B, too far
    ((5, 0), (0, 0, 10, 0), 0, True),  # ON the segment, ε = 0
    ((5, 1), (0, 0, 10, 0), 0, False),  # off by 1, ε = 0
    ((7, 7), (4, 4, 4, 4), 5, True),  # zero-length segment (3-4-5)
    ((8, 8), (4, 4, 4, 4), 5, False),  # zero-length, too far
    ((0, 0), (0, 0, 10, 10), 0, True),  # endpoint coincidence
]


@pytest.mark.parametrize("p,s,eps,want", CASES)
def test_predicate_cases(spark, p, s, eps, want):
    # points live in the non-negative domain; shift the whole case so
    # the geometry (and thus the verdict) is translation-invariant
    sx, sy = 100, 100
    p2 = (p[0] + sx, p[1] + sy)
    s2 = (s[0] + sx, s[1] + sy, s[2] + sx, s[3] + sy)
    got = _pairs(spark, [(1, *p2)], [(2, *s2)], eps, cell=8)
    assert (len(got) == 1) == want
    assert _ref_within(p2, s2, eps) == want


def _random_fixture(rng, n_pts, n_segs):
    pts = [
        (i, rng.randrange(2000), rng.randrange(2000)) for i in range(n_pts)
    ]
    segs = []
    for i in range(n_segs):
        x, y = rng.randrange(2000), rng.randrange(2000)
        dx, dy = rng.randrange(-300, 301), rng.randrange(-300, 301)
        segs.append(
            (1000 + i, x, y, max(0, min(2300, x + dx)), max(0, min(2300, y + dy)))
        )
    return pts, segs


@pytest.mark.parametrize("seed,eps,cell", [(0, 40, 256), (1, 75, 97), (2, 40, 32)])
def test_random_differential(spark, seed, eps, cell):
    """Brute-force equality — including a cell far smaller than the
    expanded bboxes, so multi-cell replicas stress exactly-once."""
    rng = random.Random(seed)
    pts, segs = _random_fixture(rng, 120, 60)
    want = {
        (p[0], s[0])
        for p in pts
        for s in segs
        if _ref_within(p[1:], s[1:], eps)
    }
    assert want, "vacuous fixture"
    assert _pairs(spark, pts, segs, eps, cell) == want


def test_cell_size_invariance(spark):
    rng = random.Random(9)
    pts, segs = _random_fixture(rng, 100, 50)
    results = [_pairs(spark, pts, segs, 60, c) for c in (64, 128, 513)]
    assert results[0] == results[1] == results[2]
    assert results[0], "vacuous fixture"


def test_domain_border_clamp(spark):
    """A segment near the domain corner with a huge ε: the expanded
    bbox clamps to the domain instead of exploding to negative cells,
    and border points still match."""
    segs = [(1, 0, 0, 10, 0)]
    pts = [(1, 0, 0), (2, 0, 500), (3, 510, 0), (4, 511, 0)]
    got = _pairs(spark, pts, segs, 500, cell=64)
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_bad_args_raise(spark):
    pdf = spark.createDataFrame([(1, 0, 0)], PT_SCHEMA)
    sdf = spark.createDataFrame([(1, 0, 0, 1, 1)], SEG_SCHEMA)
    with pytest.raises(ValueError):
        points_near_segments(pdf, sdf, 5, 0)
    with pytest.raises(ValueError):
        points_near_segments(pdf, sdf, -1, 8)


def test_plan_shape(spark):
    pdf = spark.createDataFrame([(1, 5, 5)], PT_SCHEMA)
    sdf = spark.createDataFrame([(2, 0, 0, 10, 10)], SEG_SCHEMA)
    plan = (
        points_near_segments(pdf, sdf, 3, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_static_matches_batch(spark, tmp_path):
    """Arriving points × static segment set: points_near_segments runs
    unchanged on a streaming points side (the point side never
    aggregates or explodes — it is a stateless projection into a
    stream-static inner equi-join, zero state store); an availableNow
    drain over the backlog == the batch join."""
    rng = random.Random(11)
    pts, segs = _random_fixture(rng, 80, 40)
    pdf = spark.createDataFrame(pts, PT_SCHEMA)
    sdf = spark.createDataFrame(segs, SEG_SCHEMA)
    want = {
        (r.id_p, r.id_s)
        for r in points_near_segments(pdf, sdf, 60, 128).collect()
    }
    assert want, "vacuous fixture"
    backlog = str(tmp_path / "pts_backlog")
    pdf.write.parquet(backlog)
    stream = spark.readStream.schema(PT_SCHEMA).parquet(backlog)
    q = (
        points_near_segments(stream, sdf, 60, 128)
        .writeStream.format("memory")
        .queryName("ptseg_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ptseg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.id_p, r.id_s)
        for r in spark.sql("SELECT * FROM ptseg_sink").collect()
    }
    assert got == want


# ---------------------------------------------------------------- snap


def _dist_frac_ref(p, s):
    """(Fraction, num, den) — the operator's exact rational, verbatim."""
    px, py = p
    x1, y1, x2, y2 = s
    abx, aby = x2 - x1, y2 - y1
    apx, apy = px - x1, py - y1
    dot = apx * abx + apy * aby
    l2 = abx * abx + aby * aby
    if dot <= 0:
        n = apx * apx + apy * apy
        return Fraction(n), n, 1
    if dot >= l2:
        bpx, bpy = px - x2, py - y2
        n = bpx * bpx + bpy * bpy
        return Fraction(n), n, 1
    cross = abx * apy - aby * apx
    return Fraction(cross * cross, l2), cross * cross, l2


def _snap_ref(pts, segs):
    want = {}
    for pid, px, py in pts:
        best = None
        for s in segs:
            fr, num, den = _dist_frac_ref((px, py), s[1:])
            if best is None or (fr, s[0]) < best[0]:
                best = ((fr, s[0]), (s[0], num, den))
        want[pid] = best[1]
    return want


def _snap(spark, pts, segs, init_radius, **kw):
    pdf = spark.createDataFrame(pts, PT_SCHEMA)
    sdf = spark.createDataFrame(segs, SEG_SCHEMA)
    rows = snap_to_segments(pdf, sdf, init_radius, **kw).collect()
    got = {r["id_p"]: (r["id_s"], r["d2_num"], r["d2_den"]) for r in rows}
    assert len(got) == len(rows), "duplicate point emitted"
    return got


@pytest.mark.parametrize("seed,init", [(3, 64), (4, 500)])
def test_snap_differential(spark, seed, init):
    """Exact-nearest equality against the Fraction brute force,
    including a far straggler that must escalate several rounds."""
    rng = random.Random(seed)
    pts, segs = _random_fixture(rng, 50, 25)
    pts = pts + [(999, 35000, 17000)]
    want = _snap_ref(pts, segs)
    assert _snap(spark, pts, segs, init) == want


def test_snap_tiebreak_min_id(spark):
    """Two geometrically identical segments: the smaller id wins, and
    the emitted fraction is the exact squared distance."""
    segs = [(7, 100, 100, 200, 100), (5, 100, 100, 200, 100)]
    got = _snap(spark, [(1, 150, 103)], segs, 8)
    # interior case: the fraction is the unreduced cross²/|AB|²
    assert got == {1: (5, 90000, 10000)}


def test_snap_interior_fraction_exact(spark):
    """An interior snap whose distance is a non-integer rational: the
    fraction comes back unreduced as cross²/|AB|²."""
    # P=(0,5) vs segment (0,0)-(3,1): cross = 3*5-1*0 = 15, l2 = 10
    segs = [(1, 200, 200, 203, 201)]
    got = _snap(spark, [(9, 200, 205)], segs, 4)
    assert got == {9: (1, 225, 10)}


def test_snap_empty_segments(spark):
    pdf = spark.createDataFrame([(1, 5, 5)], PT_SCHEMA)
    sdf = spark.createDataFrame([], SEG_SCHEMA)
    assert snap_to_segments(pdf, sdf, 8).count() == 0


def test_snap_bad_args(spark):
    pdf = spark.createDataFrame([(1, 0, 0)], PT_SCHEMA)
    sdf = spark.createDataFrame([(1, 0, 0, 1, 1)], SEG_SCHEMA)
    with pytest.raises(ValueError):
        snap_to_segments(pdf, sdf, 0)
