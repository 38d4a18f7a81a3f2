"""ε-neighbor spatial self-join + grid-DBSCAN (operators/neighbors.py).

Property strategy: the distributed grid-bucketed join must equal the
O(n²) brute force on random integer point clouds — completeness (no pair
within ε missed by the cell decomposition) AND exactly-once emission (no
post-join distinct hides a double count). The oracle twin parity runs in
tests/test_driver_excluded.py; these tests pin the operator itself plus
the plan shape (no CartesianProduct — the whole point of the operator).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.neighbors import (
    grid_dbscan_cells,
    ripley_k_counts,
    within_distance_pairs,
)

W, H = 36000, 18000  # shifted centidegree domain


def _cloud(spark, n: int, seed: int):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, W, n)
    ys = rng.integers(0, H, n)
    rows = [(i, int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    return rows, spark.createDataFrame(rows, "id long, xs long, ys long")


def _brute_pairs(rows, r: int) -> set[tuple[int, int, int]]:
    out = set()
    pts = np.array([(x, y) for _, x, y in rows], dtype=np.int64)
    ids = np.array([i for i, _, _ in rows], dtype=np.int64)
    for j in range(len(rows)):
        d2 = (pts[:, 0] - pts[j, 0]) ** 2 + (pts[:, 1] - pts[j, 1]) ** 2
        for k in np.nonzero(d2 <= r * r)[0]:
            if ids[j] < ids[k]:
                out.add((int(ids[j]), int(ids[k]), int(d2[k])))
    return out


@pytest.mark.parametrize("seed,n,r", [(1, 300, 900), (2, 500, 400), (3, 80, 3000)])
def test_pairs_match_brute_force(spark, seed, n, r):
    rows, df = _cloud(spark, n, seed)
    got = within_distance_pairs(df, r).collect()
    got_set = {(x.id_a, x.id_b, x.dist2) for x in got}
    assert len(got) == len(got_set), "pair emitted more than once"
    assert got_set == _brute_pairs(rows, r)


def test_pairs_duplicate_coordinates(spark):
    # coincident points (dist2 = 0) and same-cell pairs emit exactly once
    rows = [(1, 100, 100), (2, 100, 100), (3, 105, 100), (4, 5000, 5000)]
    df = spark.createDataFrame(rows, "id long, xs long, ys long")
    got = sorted(
        (x.id_a, x.id_b, x.dist2)
        for x in within_distance_pairs(df, 10).collect()
    )
    assert got == [(1, 2, 0), (1, 3, 25), (2, 3, 25)]


def test_pairs_cross_cell_boundary(spark):
    # points in ADJACENT cells but within r — the replication ring must
    # carry the partner over the boundary (r=100 → cells [0,100),[100,200))
    df = spark.createDataFrame(
        [(1, 99, 50), (2, 101, 50)], "id long, xs long, ys long"
    )
    got = within_distance_pairs(df, 100).collect()
    assert [(x.id_a, x.id_b, x.dist2) for x in got] == [(1, 2, 4)]


def test_pairs_plan_no_cartesian(spark):
    _, df = _cloud(spark, 50, 9)
    plan = (
        within_distance_pairs(df, 500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pairs_rejects_bad_radius(spark):
    _, df = _cloud(spark, 5, 0)
    with pytest.raises(ValueError):
        within_distance_pairs(df, 0)


@pytest.mark.parametrize("seed,n,radii", [(4, 300, (400, 900, 2000)), (5, 120, (50, 3000))])
def test_ripley_matches_brute_force(spark, seed, n, radii):
    rows, df = _cloud(spark, n, seed)
    got = {
        r.radius: (r.pair_count, r.n_points)
        for r in ripley_k_counts(df, radii).collect()
    }
    assert set(got) == set(radii)
    for r in radii:
        assert got[r] == (len(_brute_pairs(rows, r)), n)


def test_ripley_vacuous_rung_reports_zero(spark):
    # two points 1000 apart: the 10-rung has no pair but still one row
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1000, 0)], "id long, xs long, ys long"
    )
    got = {
        r.radius: r.pair_count for r in ripley_k_counts(df, (10, 1000)).collect()
    }
    assert got == {10: 0, 1000: 1}


def test_ripley_validation(spark):
    _, df = _cloud(spark, 5, 0)
    with pytest.raises(ValueError):
        ripley_k_counts(df, ())
    with pytest.raises(ValueError):
        ripley_k_counts(df, (300, 200))
    with pytest.raises(ValueError):
        ripley_k_counts(df, (100, 100))


def _brute_clusters(rows, eps: int, min_pts: int):
    """Reference grid-DBSCAN: dict id -> (cell, cluster)."""
    cell_of = {}
    for i, x, y in rows:
        cell_of[i] = (x // eps) * 2**32 + (y // eps)
    counts: dict[int, int] = {}
    for c in cell_of.values():
        counts[c] = counts.get(c, 0) + 1
    dense = {c for c, n in counts.items() if n >= min_pts}
    # union-find over 8-adjacency
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for c in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = c + dx * 2**32 + dy
                if nb in dense:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    label = {c: find(c) for c in dense}
    # min-id canonical labels (find() already yields the component min
    # because unions always point the larger root at the smaller)
    return {
        i: (c, label[c])
        for i, c in cell_of.items()
        if c in dense
    }


@pytest.mark.parametrize("seed,n,eps,minp", [(7, 400, 2000, 3), (8, 800, 1500, 4)])
def test_dbscan_matches_reference(spark, seed, n, eps, minp):
    rows, df = _cloud(spark, n, seed)
    got = {
        r.id: (r.cell, r.cluster)
        for r in grid_dbscan_cells(df, eps, minp).collect()
    }
    assert got == _brute_clusters(rows, eps, minp)


def test_dbscan_isolated_dense_cell_is_own_cluster(spark):
    # 3 points in one far-away cell, no dense neighbors: the component
    # step sees zero edges for it, yet it must still be a cluster
    rows = [(1, 10, 10), (2, 11, 10), (3, 10, 11),
            (4, 30000, 17000), (5, 30001, 17000), (6, 30000, 17001),
            (7, 15000, 9000)]  # noise: sparse cell
    df = spark.createDataFrame(rows, "id long, xs long, ys long")
    got = {r.id: r.cluster for r in grid_dbscan_cells(df, 100, 3).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}  # 7 is noise
    assert len({got[1], got[4]}) == 2  # two distinct clusters
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]


# ---------------------------------------------------------------------------
# geodesic ε-join (3-D sphere lift)

import math

from osm_history_splitter_spark.operators.neighbors import (  # noqa: E402
    EARTH_RADIUS_M,
    _SPHERE_SCALE,
    geodesic_pairs,
)


def _quantized_brute(rows, radius_m):
    """Reference mirroring the implementation's quantized-chord criterion
    (numpy trig; 1-ulp divergence from JVM StrictMath would need a sin()
    value within 1e-9 of a quantum midpoint — not reachable from these
    fixed seeds)."""
    chord = 2.0 * math.sin(min(radius_m / EARTH_RADIUS_M, math.pi) / 2.0)
    thr2 = int(math.floor((chord * _SPHERE_SCALE) ** 2))
    lon = np.radians(np.array([r[1] for r in rows]))
    lat = np.radians(np.array([r[2] for r in rows]))
    q = np.stack(
        [
            np.round(np.cos(lat) * np.cos(lon) * _SPHERE_SCALE),
            np.round(np.cos(lat) * np.sin(lon) * _SPHERE_SCALE),
            np.round(np.sin(lat) * _SPHERE_SCALE),
        ],
        axis=1,
    ).astype(np.int64)
    ids = [r[0] for r in rows]
    out = set()
    for i in range(len(rows)):
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        for j in np.nonzero(d2 <= thr2)[0]:
            if ids[i] < ids[int(j)]:
                out.add((ids[i], ids[int(j)], int(d2[j])))
    return out


def _geo_cloud(n, seed, lon0=0.0, lat0=0.0, spread=2.0):
    rng = np.random.default_rng(seed)
    return [
        (i, float(lon0 + rng.uniform(-spread, spread)),
         float(lat0 + rng.uniform(-spread, spread)))
        for i in range(n)
    ]


@pytest.mark.parametrize(
    "seed,n,radius_m,lat0",
    [(31, 300, 50_000, 0.0), (32, 300, 20_000, 60.0), (33, 150, 120_000, -45.0)],
)
def test_geodesic_matches_quantized_brute(spark, seed, n, radius_m, lat0):
    rows = _geo_cloud(n, seed, lat0=lat0)
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = {(r.id_a, r.id_b, r.dist2) for r in geodesic_pairs(df, radius_m).collect()}
    want = _quantized_brute(rows, radius_m)
    assert len(want) > 0, "vacuous fixture"
    assert got == want


def test_geodesic_antimeridian_pair(spark):
    # ~222 m apart across the ±180° seam — a lon/lat grid needs a ghost
    # column for this; the sphere lift does not
    rows = [(1, 179.999, 0.0), (2, -179.999, 0.0), (3, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = [(r.id_a, r.id_b) for r in geodesic_pairs(df, 300.0).collect()]
    assert got == [(1, 2)]


def test_geodesic_polar_pair(spark):
    # two points straddling the north pole on opposite meridians:
    # planar lon distance says "half the planet", the sphere says 222 m
    rows = [(1, 0.0, 89.999), (2, 180.0, 89.999), (3, 90.0, 45.0)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = [(r.id_a, r.id_b) for r in geodesic_pairs(df, 300.0).collect()]
    assert got == [(1, 2)]


def test_geodesic_whole_planet_radius(spark):
    # radius ≥ πR: chord saturates at the diameter → every pair qualifies
    rows = [(1, 0.0, 0.0), (2, 180.0, 0.0), (3, 90.0, 90.0)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    assert geodesic_pairs(df, 2.1e7).count() == 3


def test_geodesic_plan_and_validation(spark):
    rows = _geo_cloud(40, 99)
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    plan = (
        geodesic_pairs(df, 10_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        geodesic_pairs(df, 0)


# ---------------------------------------------------------------------------
# two-relation ε-join (batch + stream-static)

from osm_history_splitter_spark.operators.neighbors import (  # noqa: E402
    within_distance_join,
)


def _brute_join(lrows, rrows, r):
    out = set()
    for i, xl, yl in lrows:
        for j, xr, yr in rrows:
            d2 = (xl - xr) ** 2 + (yl - yr) ** 2
            if d2 <= r * r:
                out.add((i, j, d2))
    return out


def test_join_matches_brute_force(spark):
    rng = np.random.default_rng(17)
    lrows = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 4000, 250), rng.integers(0, 4000, 250)))]
    rrows = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 4000, 100), rng.integers(0, 4000, 100)))]
    ldf = spark.createDataFrame(lrows, "id long, xs long, ys long")
    rdf = spark.createDataFrame(rrows, "id long, xs long, ys long")
    got = {
        (r.id_l, r.id_r, r.dist2)
        for r in within_distance_join(ldf, rdf, 300).collect()
    }
    want = _brute_join(lrows, rrows, 300)
    assert len(want) > 0 and got == want


def test_join_stream_static_matches_batch(spark, tmp_path):
    """Arriving points × static POI set: the ε-join runs unchanged on a
    streaming left side (stream-static inner equi-join, zero state
    store); an availableNow drain over the backlog == the batch join."""
    rng = np.random.default_rng(23)
    lrows = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 3000, 120), rng.integers(0, 3000, 120)))]
    rrows = [(1000 + i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 3000, 40), rng.integers(0, 3000, 40)))]
    ldf = spark.createDataFrame(lrows, "id long, xs long, ys long")
    rdf = spark.createDataFrame(rrows, "id long, xs long, ys long")
    backlog = str(tmp_path / "backlog")
    ldf.write.parquet(backlog)
    want = {
        (r.id_l, r.id_r, r.dist2)
        for r in within_distance_join(ldf, rdf, 400).collect()
    }
    stream = spark.readStream.schema("id long, xs long, ys long").parquet(
        backlog
    )
    q = (
        within_distance_join(stream, rdf, 400)
        .writeStream.format("memory")
        .queryName("nbr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_nbr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.id_l, r.id_r, r.dist2)
        for r in spark.sql("SELECT * FROM nbr_sink").collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# kNN join (radius-doubling over the ε-join)

from osm_history_splitter_spark.operators.neighbors import knn_join  # noqa: E402


def _brute_knn(lrows, rrows, k):
    want = set()
    for i, xl, yl in lrows:
        ds = sorted(
            ((xl - xr) ** 2 + (yl - yr) ** 2, j) for j, xr, yr in rrows
        )
        for rk, (d2, j) in enumerate(ds[:k], start=1):
            want.add((i, j, d2, rk))
    return want


@pytest.mark.parametrize("seed,nl,nr,k,r0", [(41, 150, 200, 5, 50), (42, 60, 25, 40, 10)])
def test_knn_join_matches_brute(spark, seed, nl, nr, k, r0):
    # seed 42 exercises k > |right|: every left point resolves only at
    # max_radius and gets all 25 neighbors
    rng = np.random.default_rng(seed)
    lrows = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 5000, nl), rng.integers(0, 5000, nl)))]
    rrows = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 5000, nr), rng.integers(0, 5000, nr)))]
    ldf = spark.createDataFrame(lrows, "id long, xs long, ys long")
    rdf = spark.createDataFrame(rrows, "id long, xs long, ys long")
    got = {
        (r.id_l, r.id_r, r.dist2, r.rk)
        for r in knn_join(ldf, rdf, k, r0).collect()
    }
    assert got == _brute_knn(lrows, rrows, k)


def test_knn_join_deterministic_ties(spark):
    # four right points equidistant from the left point: ties break by
    # id_r ascending, reproducibly
    ldf = spark.createDataFrame([(0, 100, 100)], "id long, xs long, ys long")
    rdf = spark.createDataFrame(
        [(7, 110, 100), (3, 90, 100), (9, 100, 110), (5, 100, 90)],
        "id long, xs long, ys long",
    )
    got = [(r.id_r, r.rk) for r in
           knn_join(ldf, rdf, 3, 5).orderBy("rk").collect()]
    assert got == [(3, 1), (5, 2), (7, 3)]


def test_knn_join_validation(spark):
    df = spark.createDataFrame([(0, 1, 1)], "id long, xs long, ys long")
    with pytest.raises(ValueError):
        knn_join(df, df, 0, 10)
    with pytest.raises(ValueError):
        knn_join(df, df, 1, 0)


# ---------------------------------------------------------------------------
# geodesic two-relation join + geodesic kNN

from osm_history_splitter_spark.operators.neighbors import (  # noqa: E402
    geodesic_join,
    geodesic_knn_join,
)


def _quantize(rows):
    lon = np.radians(np.array([r[1] for r in rows]))
    lat = np.radians(np.array([r[2] for r in rows]))
    return np.stack(
        [
            np.round(np.cos(lat) * np.cos(lon) * _SPHERE_SCALE),
            np.round(np.cos(lat) * np.sin(lon) * _SPHERE_SCALE),
            np.round(np.sin(lat) * _SPHERE_SCALE),
        ],
        axis=1,
    ).astype(np.int64)


def test_geodesic_join_matches_quantized_brute(spark):
    lrows = _geo_cloud(200, 51, lat0=30.0)
    rrows = [(1000 + i, lo, la) for i, lo, la in _geo_cloud(80, 52, lat0=30.0)]
    ldf = spark.createDataFrame(lrows, "id long, lon double, lat double")
    rdf = spark.createDataFrame(rrows, "id long, lon double, lat double")
    radius_m = 60_000
    got = {
        (r.id_l, r.id_r, r.dist2)
        for r in geodesic_join(ldf, rdf, radius_m).collect()
    }
    chord = 2.0 * math.sin(radius_m / EARTH_RADIUS_M / 2.0)
    thr2 = int(math.floor((chord * _SPHERE_SCALE) ** 2))
    ql, qr = _quantize(lrows), _quantize(rrows)
    want = set()
    for i, lrow in enumerate(lrows):
        d2 = ((qr - ql[i]) ** 2).sum(axis=1)
        for j in np.nonzero(d2 <= thr2)[0]:
            want.add((lrow[0], rrows[int(j)][0], int(d2[j])))
    assert len(want) > 0 and got == want


def test_geodesic_knn_matches_brute(spark):
    lrows = _geo_cloud(60, 61, lon0=170.0, lat0=70.0, spread=15.0)
    rrows = [(1000 + i, lo, la)
             for i, lo, la in _geo_cloud(40, 62, lon0=-175.0, lat0=75.0,
                                         spread=15.0)]
    ldf = spark.createDataFrame(lrows, "id long, lon double, lat double")
    rdf = spark.createDataFrame(rrows, "id long, lon double, lat double")
    k = 4
    got = {
        (r.id_l, r.id_r, r.dist2, r.rk)
        for r in geodesic_knn_join(ldf, rdf, k, 50_000).collect()
    }
    ql, qr = _quantize(lrows), _quantize(rrows)
    want = set()
    for i, lrow in enumerate(lrows):
        d2 = ((qr - ql[i]) ** 2).sum(axis=1)
        order = sorted((int(d), rrows[j][0]) for j, d in enumerate(d2))
        for rk, (d, rid) in enumerate(order[:k], start=1):
            want.add((lrow[0], rid, d, rk))
    assert got == want


def test_geodesic_knn_fewer_than_k(spark):
    # only 2 POIs on the planet, k=5: both come back, by escalation to
    # the half-circumference fallback
    ldf = spark.createDataFrame(
        [(1, 10.0, 10.0)], "id long, lon double, lat double"
    )
    rdf = spark.createDataFrame(
        [(8, -170.0, -60.0), (9, 11.0, 10.0)],
        "id long, lon double, lat double",
    )
    got = [(r.id_r, r.rk) for r in
           geodesic_knn_join(ldf, rdf, 5, 1000.0).orderBy("rk").collect()]
    assert got == [(9, 1), (8, 2)]


from osm_history_splitter_spark.operators.neighbors import (  # noqa: E402
    variogram_bins,
)


def _valued_cloud(spark, n: int, seed: int):
    rng = np.random.default_rng(seed)
    rows = [
        (
            i,
            int(rng.integers(0, 4000)),
            int(rng.integers(0, 4000)),
            int(rng.integers(-50, 50)),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, xs long, ys long, val long")
    return rows, df


def _brute_variogram(rows, radii):
    out = {r: [0, 0] for r in radii}
    rmax = max(radii)
    for i, (ia, xa, ya, va) in enumerate(rows):
        for ib, xb, yb, vb in rows[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 > rmax * rmax:
                continue
            r = next(r for r in radii if d2 <= r * r)
            out[r][0] += 1
            out[r][1] += (va - vb) ** 2
    return {r: tuple(v) for r, v in out.items()}


@pytest.mark.parametrize(
    "seed,n,radii",
    [(7, 300, (100, 250, 600)), (8, 500, (50, 500, 1000, 2000))],
)
def test_variogram_matches_brute(spark, seed, n, radii):
    rows, df = _valued_cloud(spark, n, seed)
    got = {
        r.radius: (r.n_pairs, r.sum_sq_diff)
        for r in variogram_bins(df, radii).collect()
    }
    want = _brute_variogram(rows, radii)
    assert got == want
    assert any(v[0] > 0 for v in want.values()), "vacuous fixture"


def test_variogram_colocated_pairs_land_in_first_bin(spark):
    # d = 0 pairs are bin-1 lags with a real squared value difference
    df = spark.createDataFrame(
        [(1, 5, 5, 10), (2, 5, 5, 4), (3, 5, 6, 0)],
        "id long, xs long, ys long, val long",
    )
    got = {
        r.radius: (r.n_pairs, r.sum_sq_diff)
        for r in variogram_bins(df, (2, 10)).collect()
    }
    # pairs: (1,2) d2=0 dv=6 -> bin 2's? no: bin r=2 (d2<=4); (1,3)/(2,3)
    # d2=1 -> bin 2 as well; sum = 36 + 100 + 16
    assert got == {2: (3, 152), 10: (0, 0)}


def test_variogram_validation(spark):
    _, df = _valued_cloud(spark, 5, 0)
    with pytest.raises(ValueError):
        variogram_bins(df, ())
    with pytest.raises(ValueError):
        variogram_bins(df, (100, 50))
