"""Raster↔vector bridge (north_rule: "H3/S2 index, point-in-polygon, kNN,
raster↔vector").

A *raster* here is the engine's grid materialized as a table: one row per
cell with aggregate bands — the standard Spark-native raster representation
(cell id is the pixel index; resolution fixes the geotransform).

- ``rasterize``: vector→raster — points aggregated per cell (count + sum
  bands). One map-side-combinable groupBy; no joins.
- ``cell_bounds`` / ``raster_to_points``: raster→vector — cells back to
  center points / corner rings (pure Catalyst arithmetic).
- ``zonal_stats``: raster × polygon — per-extract aggregates over cells
  whose *center* lies in the extract (center-point rule, the common GIS
  convention). Reuses the spatial join: broadcast cover + refine, then one
  aggregation.
- ``region_labels`` / ``boundary_edges`` / ``polygonize``: the full
  raster→vector path (GDAL ``polygonize`` analog): 4-adjacent same-class
  cells become labeled regions (distributed connected components), each
  region's outline becomes directed boundary segments (interior-on-the-left
  orientation, so outers come out counter-clockwise and holes clockwise),
  and the segments are stitched into closed rings per region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import grid
from ..plans.catalog import ExtractCatalog
from .spatial_join import assign_extracts

__all__ = [
    "rasterize",
    "local_maxima",
    "raster_gradient",
    "morans_i",
    "getis_ord_g",
    "region_label",
    "mann_kendall_trend",
    "cell_bounds",
    "raster_to_points",
    "zonal_stats",
    "region_labels",
    "boundary_edges",
    "polygonize",
]


def rasterize(
    points: DataFrame,
    res: int,
    value_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Vector→raster: (cell, n[, sum_val]) at resolution ``res``."""
    cells = points.withColumn(
        "cell", grid.cell_id_expr(F.col(lon_col), F.col(lat_col), res)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_val"))
    return cells.groupBy("cell").agg(*aggs)


def cell_center_cols(cell, res: int):
    w = grid.cell_width(res)
    # integer `div`, not `/`: double division loses exactness near 2^53
    ix = F.expr(f"cell div {grid.CELL_SHIFT}")
    iy = cell % F.lit(grid.CELL_SHIFT)
    lon = (ix.cast("double") + 0.5) * w - 180.0
    lat = (iy.cast("double") + 0.5) * w - 90.0
    return lon, lat


def raster_to_points(raster: DataFrame, res: int) -> DataFrame:
    """Raster→vector: cell centers as a point table (bands carried)."""
    lon, lat = cell_center_cols(F.col("cell"), res)
    return raster.select(
        "*", lon.alias("lon"), lat.alias("lat")
    )


def cell_bounds(raster: DataFrame, res: int) -> DataFrame:
    """Raster→vector: each cell's corner ring (closed, lon/lat)."""
    w = grid.cell_width(res)
    ix = F.expr(f"cell div {grid.CELL_SHIFT}").cast("double")
    iy = (F.col("cell") % F.lit(grid.CELL_SHIFT)).cast("double")
    x0 = ix * w - 180.0
    y0 = iy * w - 90.0
    x1 = x0 + w
    y1 = y0 + w
    ring = F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1),
        F.array(x0, y1), F.array(x0, y0),
    )
    return raster.select("*", ring.alias("ring"))


def zonal_stats(
    raster: DataFrame, catalog: ExtractCatalog, res: int
) -> DataFrame:
    """Raster×vector: per-extract aggregates over cell centers (count of
    cells, sum of band values)."""
    # drop the raster's cell id before the spatial join: 'cell' is an
    # internal join column of assign_extracts (which rejects it), and the
    # zonal aggregate never reads it — the centers carry the position
    pts = raster_to_points(raster, res).drop("cell")
    assigned = assign_extracts(pts, catalog)
    aggs = [
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").alias("n_points"),
    ]
    if "sum_val" in raster.columns:
        aggs.append(F.sum("sum_val").alias("sum_val"))
    return assigned.groupBy("extract").agg(*aggs)


def _neighbor_cells(
    raster: DataFrame, k: int, res: int, carry: tuple = ()
) -> DataFrame:
    """Explode every cell to its full Chebyshev-``k`` neighborhood —
    ``(2k+1)^2`` rows per cell, clamped to the grid domain so the index
    arithmetic never goes negative (negative ``iy`` would alias into the
    previous column under the ``ix * 2^32 + iy`` packing, and negative
    div/mod semantics differ between engines — the clamp keeps every
    decompose/recompose on non-negative integers, where Spark, DuckDB and
    numpy agree). Expects DISTINCT cells (any :func:`rasterize` output is);
    erosion's vote count is only meaningful then. Emits (cell, src_cell)."""
    mx = (1 << (res + 1)) - 1
    my = (1 << res) - 1
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-k, k + 1)
            for dy in range(-k, k + 1)
        ]
    )
    c = F.col("cell").cast("long")
    ix = F.shiftright(c, 32)
    iy = c.bitwiseAND(F.lit(grid.CELL_SHIFT - 1))
    return (
        raster.select("cell", F.explode(offsets).alias("o"), *carry)
        .select(
            F.col("cell").alias("src_cell"),
            (ix + F.col("o.dx")).alias("nix"),
            (iy + F.col("o.dy")).alias("niy"),
            *carry,
        )
        .filter(
            (F.col("nix") >= 0)
            & (F.col("nix") <= mx)
            & (F.col("niy") >= 0)
            & (F.col("niy") <= my)
        )
        .select(
            (F.col("nix") * F.lit(grid.CELL_SHIFT) + F.col("niy")).alias("cell"),
            "src_cell",
            *carry,
        )
    )


def dilate(raster: DataFrame, res: int, k: int = 1) -> DataFrame:
    """Morphological dilation on the cell raster: every cell within
    Chebyshev distance ``k`` of a present cell becomes present.

    ONE explode + ONE distinct shuffle regardless of ``k`` (the whole
    (2k+1)^2 neighborhood is generated in a single pass — no k-round
    iteration), so the cost is one shuffle of (2k+1)^2 × |raster| narrow
    rows. The vector-side use: dilating a rasterized polygon cover by k
    cells IS a grid-quantized outward buffer of k cell widths."""
    return _neighbor_cells(raster, k, res).select("cell").distinct()


def erode(raster: DataFrame, res: int, k: int = 1) -> DataFrame:
    """Morphological erosion: a cell survives iff its ENTIRE Chebyshev-``k``
    neighborhood is present. Same single explode as :func:`dilate`, inverted:
    each present cell votes for the neighbors it supports, and a cell needs
    all (2k+1)^2 votes (cells whose neighborhood is clipped by the grid
    domain cannot collect them — outside-the-domain counts as empty, the
    standard zero-padding convention)."""
    need = (2 * k + 1) ** 2
    return (
        _neighbor_cells(raster, k, res)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("nsup"))
        .filter(F.col("nsup") == need)
        .select("cell")
    )


def local_maxima(
    raster: DataFrame, res: int, k: int = 1, value_col: str = "n"
) -> DataFrame:
    """Non-maximum suppression: the cells whose value dominates their
    entire Chebyshev-``k`` neighborhood — hotspot detection over a
    density raster (the step after :func:`rasterize`/:func:`box_blur`
    in a heatmap→POI pipeline). Ties break to the LOWEST cell id, so the
    result is a pure function of the raster: of a plateau of equal
    maxima, exactly the lowest-id cell survives.

    Same single-explode shape as :func:`dilate` — each cell scatters
    ``(value, cell)`` to its neighborhood, one map-side-combinable
    ``max(struct)`` groupBy picks each neighborhood's winner, and a cell
    is a hotspot iff it wins at its own address. No joins, no second
    shuffle; cost is one shuffle of (2k+1)² × |raster| narrow rows.

    Expects DISTINCT cells. Border cells compete only against their
    in-domain neighbors (the usual zero-padding convention)."""
    nb = _neighbor_cells(raster, k, res, carry=(value_col,))
    win = nb.groupBy("cell").agg(
        F.max(
            F.struct(
                F.col(value_col).alias("v"),
                (-F.col("src_cell")).alias("negsrc"),
            )
        ).alias("m")
    )
    return win.filter(F.col("m.negsrc") == -F.col("cell")).select(
        "cell", F.col("m.v").alias(value_col)
    )


#: D8 direction ring, index 0..7 counter-clockwise from East — the
#: classic flow-direction convention of DEM hydrology, reused here for
#: density-surface ascent
D8_OFFSETS = (
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1),
)


def raster_gradient(
    raster: DataFrame, res: int, value_col: str = "n"
) -> DataFrame:
    """Per-cell finite-difference gradient + D8 steepest-ascent direction
    over a raster — the surface-analysis primitive (slope/aspect on a
    DEM, drift direction on a density or KDE surface, and the D8 pointer
    that seeds flow-accumulation / basin labeling).

    For every INPUT cell: ``gx = v(E) − v(W)``, ``gy = v(N) − v(S)``
    (central differences; absent or out-of-domain neighbors count 0 —
    the zero-padding convention of :func:`local_maxima`), and ``d8`` =
    the index (0=E, 1=NE, … 7=SE, counter-clockwise) of the
    maximum-valued 8-neighbor, ties to the LOWEST index, or −1 when no
    neighbor has a positive value (flat/isolated cell). All integer —
    slope magnitude/aspect angle are consumer-side floats (the HLL
    convention). Returns ``(cell, gx, gy, d8)``.

    Scale shape: ONE 9× map-side scatter (the :func:`dilate` explode,
    offsets carried) + ONE map-side-combinable groupBy whose 8
    conditional aggregates gather the neighborhood — no self-join of the
    raster against itself, no window, no second shuffle. Expects
    DISTINCT cells (any :func:`rasterize` output is).
    """
    mx = (1 << (res + 1)) - 1
    my = (1 << res) - 1
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-1, 2)
            for dy in range(-1, 2)
        ]
    )
    c = F.col("cell").cast("long")
    ix = F.shiftright(c, 32)
    iy = c.bitwiseAND(F.lit(grid.CELL_SHIFT - 1))
    # scatter: source cell sends (its value, its offset AS SEEN FROM the
    # target) to each in-domain neighbor address
    scat = (
        raster.select(
            "cell", F.col(value_col).cast("long").alias("v"),
            F.explode(offsets).alias("o"),
        )
        .select(
            (ix + F.col("o.dx")).alias("nix"),
            (iy + F.col("o.dy")).alias("niy"),
            (-F.col("o.dx")).alias("rdx"),
            (-F.col("o.dy")).alias("rdy"),
            "v",
        )
        .filter(
            (F.col("nix") >= 0)
            & (F.col("nix") <= mx)
            & (F.col("niy") >= 0)
            & (F.col("niy") <= my)
        )
        .select(
            (F.col("nix") * F.lit(grid.CELL_SHIFT) + F.col("niy"))
            .alias("cell"),
            "rdx",
            "rdy",
            "v",
        )
    )

    def at(dx: int, dy: int):
        return F.max(
            F.when((F.col("rdx") == dx) & (F.col("rdy") == dy), F.col("v"))
        )

    neigh = {(dx, dy): at(dx, dy).alias(f"v_{i}")
             for i, (dx, dy) in enumerate(D8_OFFSETS)}
    g = scat.groupBy("cell").agg(
        at(0, 0).alias("v_self"), *neigh.values()
    )
    vz = {
        off: F.coalesce(F.col(f"v_{i}"), F.lit(0))
        for i, off in enumerate(D8_OFFSETS)
    }
    best = F.greatest(
        *[
            F.struct(vz[off].alias("v"), F.lit(-i).alias("negidx"))
            for i, off in enumerate(D8_OFFSETS)
        ]
    )
    return (
        g.filter(F.col("v_self").isNotNull())
        .select(
            "cell",
            (vz[(1, 0)] - vz[(-1, 0)]).cast("long").alias("gx"),
            (vz[(0, 1)] - vz[(0, -1)]).cast("long").alias("gy"),
            F.when(best["v"] > 0, -best["negidx"])
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("d8"),
        )
    )


def morans_i(
    raster: DataFrame, res: int, k: int = 1, value_col: str = "n"
) -> DataFrame:
    """Global Moran's I — THE spatial-autocorrelation statistic (clustered
    vs dispersed vs random), over the OCCUPIED cells of a density raster
    with binary Chebyshev-``k`` adjacency weights (k=1 = queen
    contiguity): w_ij = 1 iff i ≠ j, both occupied, Chebyshev(i,j) <= k.

        I = (n / W) · Σ_ij w_ij (x_i - x̄)(x_j - x̄) / Σ_i (x_i - x̄)²

    Returns ONE row of exact BIGINTs — (n_cells, w_sum, i_num, i_den)
    with I = i_num / i_den — instead of a float: with d_i = n·x_i - S
    (S = Σx, so d_i = n²·(x_i - x̄) up to the shared 1/n factor, which
    cancels in the ratio), i_num = n · Σ_ij w_ij d_i d_j and
    i_den = W · Σ_i d_i², all integer arithmetic, so Spark, DuckDB and
    the pure-Python reference agree bit-for-bit (no float-hash risk).
    Overflow headroom: |d_i| <= n·max(x), so i_num <= n·W·(n·max(x))² —
    fine for rasters up to ~10⁵ occupied cells of small counts; gridded
    densities at any res are far below that per statistic.

    Scale shape: one (2k+1)²-explode of (cell, d) scattered to the
    neighborhood, one cell-keyed equi-join back against the d-table
    (both sides hash-partitioned by cell), then single-row global aggs —
    no cross join, driver sees only the 1-row result. The tiny (n, S)
    stats row rides in via a broadcast nested-loop join (1 row × n).

    Expects DISTINCT cells with integer ``value_col`` (any
    :func:`rasterize` count band is)."""
    base = raster.select("cell", F.col(value_col).cast("long").alias("x"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("s"),
    )
    d = (
        base.join(F.broadcast(stats))
        .select(
            "cell",
            "n_cells",
            (F.col("n_cells") * F.col("x") - F.col("s")).alias("d"),
        )
    )
    nb = _neighbor_cells(d.select("cell", F.col("d")), k, res, carry=("d",))
    pairs = (
        nb.filter(F.col("cell") != F.col("src_cell"))
        .withColumnRenamed("d", "d_src")
        .join(d.select("cell", F.col("d").alias("d_dst")), "cell")
    )
    pair_agg = pairs.agg(
        F.count(F.lit(1)).alias("w_sum"),
        F.coalesce(F.sum(F.col("d_src") * F.col("d_dst")), F.lit(0)).alias(
            "num_core"
        ),
    )
    den_agg = d.agg(
        F.max("n_cells").alias("n_cells"),
        F.sum(F.col("d") * F.col("d")).alias("den_core"),
    )
    return (
        den_agg.join(F.broadcast(pair_agg))
        .select(
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("w_sum").cast("long").alias("w_sum"),
            (F.col("n_cells") * F.col("num_core"))
            .cast("long")
            .alias("i_num"),
            (F.col("w_sum") * F.col("den_core")).cast("long").alias("i_den"),
        )
    )


def region_label(raster: DataFrame, res: int, k: int = 1) -> DataFrame:
    """Connected-component region labeling — the raster dissolve: every
    occupied cell gets the MIN cell id of its Chebyshev-``k``-connected
    region (k=1 = 8-connectivity / queen adjacency, the GIS default for
    blob extraction; polygon dissolve on the grid = label, then group by
    region). Isolated cells label themselves.

    Scale shape: ONE (2k+1)²-explode builds the adjacency (each
    undirected edge emitted once via the src < dst canonical order, and
    only between OCCUPIED cells — the equi-join back to the cell set
    prunes scatter targets that hit empty grid), then
    :func:`~..operators.dedup.connected_components` resolves labels by
    min-label propagation with pointer jumping — O(log diameter) rounds
    of narrow (cell, label) shuffles, lineage truncated per round. A
    continental landmass at z15 is a ~10⁷-cell component with diameter
    ~10⁴ → ~14 rounds; nothing is collected to the driver.

    Expects DISTINCT cells (any :func:`rasterize` output). Returns
    (cell, region)."""
    from .dedup import connected_components

    occupied = raster.select("cell")
    pairs = (
        _neighbor_cells(occupied, k, res)
        .filter(F.col("src_cell") < F.col("cell"))
        .join(occupied, "cell")
        .select(F.col("src_cell").alias("a"), F.col("cell").alias("b"))
    )
    cc = connected_components(pairs, "a", "b").withColumnRenamed(
        "doc_id", "cell"
    )
    return occupied.join(cc, "cell", "left").select(
        "cell",
        F.coalesce(F.col("cluster_id"), F.col("cell")).alias("region"),
    )


def getis_ord_g(
    raster: DataFrame, res: int, k: int = 1, value_col: str = "n"
) -> DataFrame:
    """Getis-Ord Gi* — the LOCAL hotspot statistic (the per-cell
    complement of :func:`morans_i`'s global score): for every occupied
    cell, how far its Chebyshev-``k`` neighborhood sum (INCLUDING the
    cell itself — the * variant) sits above or below the global mean,
    in standard-error units. Adjacency is binary over OCCUPIED cells
    (matching :func:`morans_i`'s contiguity convention).

    Returns exact BIGINTs instead of the float z-score — per cell
    ``(cell, w_i, g_num, g_den_sq)`` with

        z_i = g_num · sqrt((n_cells - 1) / g_den_sq)

    where ``w_i`` = |occupied neighborhood ∪ {i}|,
    ``g_num = n·L_i - S·w_i`` (L_i = neighborhood value sum, S = Σx,
    n = occupied-cell count) and
    ``g_den_sq = (n·Q - S²)·(n·w_i - w_i²)`` (Q = Σx²) — so Spark,
    DuckDB and the pure-Python reference agree bit-for-bit and the hot/
    cold classification (|z_i| > z_crit ⇔ (n-1)·g_num² > z_crit²·
    g_den_sq, sign from g_num) needs no floats either. Degenerate
    cases are honest zeros: a constant raster gives g_den_sq = 0 for
    every cell, and a neighborhood that swallows the whole raster gives
    n·w_i - w_i² = 0.

    Overflow headroom: |g_num| <= 2·n²·max(x)·(2k+1)² and
    g_den_sq <= n²·max(x)²·n·w_i — safe in int64 for rasters up to
    ~10⁵ occupied cells of small counts (any gridded density here).

    Scale shape: ONE (2k+1)²-explode of (cell, x) scattered to the
    neighborhood, one map-side-combinable groupBy(cell), one cell-keyed
    equi-join back against the occupied set (both sides hash-partitioned
    by cell), and the 1-row global stats ride in via a broadcast
    nested-loop join — no cross join, nothing on the driver.

    Expects DISTINCT cells with integer ``value_col``."""
    base = raster.select("cell", F.col(value_col).cast("long").alias("x"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    loc = (
        _neighbor_cells(base, k, res, carry=("x",))
        .groupBy("cell")
        .agg(
            F.sum("x").alias("l_sum"),
            F.count(F.lit(1)).alias("w_i"),
        )
    )
    n, s, q = F.col("n_cells"), F.col("s"), F.col("q")
    w = F.col("w_i").cast("long")
    return (
        base.select("cell")
        .join(loc, "cell")
        .join(F.broadcast(stats))
        .select(
            "cell",
            w.alias("w_i"),
            (n * F.col("l_sum") - s * w).cast("long").alias("g_num"),
            ((n * q - s * s) * (n * w - w * w))
            .cast("long")
            .alias("g_den_sq"),
        )
    )


def mann_kendall_trend(
    series: DataFrame,
    cell_col: str = "cell",
    period_col: str = "period",
    value_col: str = "v",
) -> DataFrame:
    """Mann-Kendall trend statistic per cell — the TEMPORAL sibling of
    :func:`getis_ord_g` and the core of "emerging hotspot" analysis
    (ESRI space-time-cube semantics): is each cell's value series
    monotonically rising or falling across the period ladder?

    Input: one row per present ``(cell, period, value)`` with integer
    values and UNIQUE periods per cell (the natural shape out of a
    per-period :func:`rasterize`). Returns exact BIGINTs per cell —
    ``(cell, n_periods, s_stat, var_s_18)`` with

        S        = Σ_{i<j by period} sign(v_j - v_i)
        var_s_18 = n(n-1)(2n+5) - Σ_ties t(t-1)(2t+5)     (18·Var(S))

    so the consumer z-score is ``(S - sign(S)) / sqrt(var_s_18 / 18)``
    and the rising/falling classification at z_crit needs no floats:
    ``18·(S ∓ 1)² > z_crit²·var_s_18`` with the sign from S. Degenerate
    series are honest zeros: a single period gives (0, 0); an
    all-constant series gives S = 0 AND var_s_18 = 0 (the tie term
    swallows the variance — no division rescue needed, the consumer
    checks var first). Overflow: |S| ≤ n(n-1)/2 and var_s_18 ≤ 2n³+3n²
    — int64-safe beyond n = 10⁶ periods, far past any time ladder.

    Scale shape: ONE map-side-combinable groupBy(cell) shuffles the
    narrow (cell, period, value) rows; the O(n²) pair scan then runs
    IN-ROW over the collected per-cell series via higher-order array
    functions — pure codegen, no self-join, no Python, nothing on the
    driver. Designed for bounded period ladders (hours/days/weeks:
    n ≤ a few hundred), where per-row quadratic work is microseconds
    and the alternative per-cell time self-join would shuffle n× more
    rows to produce the same counts."""
    zero = F.lit(0).cast("long")

    def sgn(d):
        return (
            F.when(d > 0, 1).when(d < 0, -1).otherwise(0).cast("long")
        )

    ser = (
        series.select(
            F.col(cell_col).alias("cell"),
            F.col(period_col).cast("long").alias("p"),
            F.col(value_col).cast("long").alias("x"),
        )
        .groupBy("cell")
        .agg(F.sort_array(F.collect_list(F.struct("p", "x"))).alias("ser"))
    )
    vs = F.transform(F.col("ser"), lambda e: e["x"])
    n = F.size("ser")
    # S: for each 0-based j >= 1, sum sign(v_j - v_i) over the prefix
    # i < j (slice is 1-based; its length-j prefix is exactly that set)
    j_idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    s_terms = F.transform(
        j_idx,
        lambda j: F.aggregate(
            F.slice(vs, 1, j), zero, lambda acc, vi: acc + sgn(F.get(vs, j) - vi)
        ),
    )
    s_stat = F.aggregate(s_terms, zero, lambda a, b: a + b)
    # tie correction over distinct values: t = multiplicity of each value
    tie = F.aggregate(
        F.transform(
            F.array_distinct(vs),
            lambda v: F.size(F.filter(vs, lambda x: x == v)).cast("long"),
        ),
        zero,
        lambda acc, t: acc + t * (t - 1) * (2 * t + 5),
    )
    nl = n.cast("long")
    return ser.select(
        "cell",
        nl.alias("n_periods"),
        s_stat.alias("s_stat"),
        (nl * (nl - 1) * (2 * nl + 5) - tie).alias("var_s_18"),
    )


def box_blur(
    raster: DataFrame, res: int, k: int = 1, value_cols: tuple = ("n",)
) -> DataFrame:
    """Box-kernel smoothing (the heatmap/KDE workhorse): for every cell
    within reach of data, the SUM of each value column over the full
    Chebyshev-``k`` neighborhood, zero-padded at the grid border.

    SEPARABLE implementation — the box kernel factors into a horizontal
    then a vertical 1-D pass, so the explode factor is 2·(2k+1) instead of
    (2k+1)²: at k=3 that is 14 rows/cell over two combinable groupBy
    shuffles vs 49 rows/cell in one — the classic separable-filter
    optimization, exact for sums (the oracle twin deliberately uses the
    direct 2-D formulation, so the equivalence is itself under test).

    Expects distinct cells (any :func:`rasterize` output). Output cell set
    = the k-dilation of the input."""
    mx = (1 << (res + 1)) - 1
    my = (1 << res) - 1

    def one_pass(df: DataFrame, axis: str) -> DataFrame:
        offs = F.array(*[F.lit(d) for d in range(-k, k + 1)])
        c = F.col("cell").cast("long")
        ix = F.shiftright(c, 32)
        iy = c.bitwiseAND(F.lit(grid.CELL_SHIFT - 1))
        nix = ix + F.col("o") if axis == "x" else ix
        niy = iy + F.col("o") if axis == "y" else iy
        bound, nv = (mx, nix) if axis == "x" else (my, niy)
        return (
            df.select("cell", F.explode(offs).alias("o"), *value_cols)
            .filter((nv >= 0) & (nv <= bound))
            .groupBy(
                (nix * F.lit(grid.CELL_SHIFT) + niy).alias("cell")
            )
            .agg(*[F.sum(v).alias(v) for v in value_cols])
        )

    return one_pass(one_pass(raster, "x"), "y")


def closing(raster: DataFrame, res: int, k: int = 1) -> DataFrame:
    """dilate then erode — fills holes/gaps narrower than ~2k cells.

    Border caveat: under the zero-padding convention, extensivity
    (closing ⊇ base) holds for cells at Chebyshev distance >= k from the
    grid-domain border; base cells ON the border are clipped away (their
    eroded neighborhood can never be complete). Image libraries make the
    same trade under 'constant 0' border mode."""
    return erode(dilate(raster, res, k), res, k)


def opening(raster: DataFrame, res: int, k: int = 1) -> DataFrame:
    """erode then dilate — removes specks smaller than ~2k cells."""
    return dilate(erode(raster, res, k), res, k)


def parent_cell_expr(cell):
    """Cell id at resolution r-1 from a cell at r: both axis indices halve
    (the grid origin is axis-aligned and widths double per level). Pure
    integer shift arithmetic on the PASSED expression (CELL_SHIFT is 2^32,
    both indices non-negative) — exact, codegen-friendly, and correct for
    any column name or computed expression, not just a column literally
    named ``cell``."""
    c = cell.cast("long")
    ix = F.shiftright(c, 32)
    iy = c.bitwiseAND(F.lit(grid.CELL_SHIFT - 1))
    return F.shiftright(ix, 1) * F.lit(grid.CELL_SHIFT) + F.shiftright(iy, 1)


def tile_pyramid(raster: DataFrame, from_res: int, to_res: int) -> DataFrame:
    """Multi-resolution rollup: (res, cell, n[, sum_val]) for every level
    from ``from_res`` down to ``to_res``.

    Each level aggregates the PREVIOUS level (4 children → 1 parent), not
    the raw points — the hypertable/tile-pyramid pattern: total work is
    O(cells) summed over levels (a geometric series), and every groupBy is
    map-side combinable on an already-tiny input. Building L levels from
    raw points instead would scan the planet L times."""
    has_sum = "sum_val" in raster.columns
    aggs = [F.sum("n").alias("n")] + (
        [F.sum("sum_val").alias("sum_val")] if has_sum else []
    )
    cols = ["res", "cell", "n"] + (["sum_val"] if has_sum else [])
    level = raster.withColumn("res", F.lit(from_res))
    out = level.select(*cols)
    for r in range(from_res - 1, to_res - 1, -1):
        level = (
            level.select(parent_cell_expr(F.col("cell")).alias("cell"), "n",
                         *(["sum_val"] if has_sum else []))
            .groupBy("cell")
            .agg(*aggs)
            .withColumn("res", F.lit(r))
        )
        out = out.unionByName(level.select(*cols))
    return out


# --- raster→vector polygonization (GDAL ``polygonize`` analog) ---------------
#
# The reference's geometry sources go vector→membership (rings in, cells
# out); this is the inverse bridge the north rule's "raster↔vector" asks
# for: take a classified raster and recover region polygons. Three stages,
# each independently testable:
#
#   region_labels   distributed connected components (4-adjacency, same
#                   class) — reuses the dedup CC kernel (min-label
#                   propagation + pointer jumping, O(log diameter) rounds);
#   boundary_edges  each cell contributes its 4 sides; a side survives iff
#                   the neighbor across it is absent or differently
#                   classed. Pure joins — no UDF;
#   polygonize      per-region ring stitching (applyInPandas — the one
#                   genuinely sequential step; per-region work is
#                   O(perimeter), regions spread across executors).


def region_labels(raster: DataFrame, class_col: str = "cls") -> DataFrame:
    """(cell, <class_col>, region): connected components of 4-adjacent
    same-class cells; ``region`` is the component's minimum cell id
    (singleton cells label themselves).

    Scale shape: two narrow equi-joins build the adjacency list (east +
    north neighbor — each undirected edge generated once), then the shared
    CC kernel iterates on (cell, label) pairs only. No geometry, no UDFs.
    """
    from .dedup import connected_components

    cells = raster.select("cell", class_col)
    a = cells.alias("a")
    pairs = None
    for delta in (grid.CELL_SHIFT, 1):  # east neighbor, north neighbor
        b = cells.alias("b")
        p = a.join(
            b,
            (F.col("b.cell") == F.col("a.cell") + F.lit(delta))
            & (F.col(f"b.{class_col}") == F.col(f"a.{class_col}")),
        ).select(F.col("a.cell").alias("ca"), F.col("b.cell").alias("cb"))
        pairs = p if pairs is None else pairs.unionByName(p)
    cc = connected_components(pairs, "ca", "cb")
    return raster.join(
        cc.withColumnRenamed("doc_id", "cell"), "cell", "left"
    ).select(
        "cell",
        class_col,
        F.coalesce(F.col("cluster_id"), F.col("cell")).alias("region"),
    )


#: side → (neighbor delta, segment in corner coords). Orientation walks
#: counter-clockwise around the cell — interior on the LEFT — so a region's
#: surviving sides stitch into CCW outers and CW holes with no post-hoc
#: orientation fix. Corner coords are INTEGER cell indices ((ix, iy) is the
#: cell's south-west corner), exact at any resolution.
_SIDES = (
    ("S", -1, (0, 0, 1, 0)),
    ("E", grid.CELL_SHIFT, (1, 0, 1, 1)),
    ("N", 1, (1, 1, 0, 1)),
    ("W", -grid.CELL_SHIFT, (0, 1, 0, 0)),
)


def boundary_edges(raster: DataFrame, class_col: str = "cls") -> DataFrame:
    """(region, <class_col>, x0, y0, x1, y1): the directed boundary segments
    of every labeled region, in integer cell-corner coordinates.

    A side is boundary iff the cell across it has a different class or does
    not exist (grid-edge wrap deltas produce ids no real cell can hold, so
    the join simply misses — strictness falls out of the id encoding).
    """
    labeled = region_labels(raster, class_col)
    nb = labeled.select(
        F.col("cell").alias("ncell"), F.col(class_col).alias("ncls")
    )
    sides = labeled.select(
        "cell",
        class_col,
        "region",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("side"),
                        (F.col("cell") + F.lit(delta)).alias("ncell"),
                    )
                    for name, delta, _ in _SIDES
                ]
            )
        ).alias("s"),
    ).select("cell", class_col, "region", "s.side", "s.ncell")
    open_sides = sides.join(
        nb,
        (sides["ncell"] == nb["ncell"]) & (F.col(class_col) == nb["ncls"]),
        "left_anti",
    )
    ix = F.expr(f"cell div {grid.CELL_SHIFT}")
    iy = F.col("cell") % F.lit(grid.CELL_SHIFT)
    x0 = y0 = x1 = y1 = None
    side = F.col("side")
    for name, _, (sx0, sy0, sx1, sy1) in _SIDES:
        e = [
            (ix + F.lit(sx0)).cast("long"),
            (iy + F.lit(sy0)).cast("long"),
            (ix + F.lit(sx1)).cast("long"),
            (iy + F.lit(sy1)).cast("long"),
        ]
        if x0 is None:
            x0, y0, x1, y1 = (F.when(side == name, c) for c in e)
        else:
            x0 = x0.when(side == name, e[0])
            y0 = y0.when(side == name, e[1])
            x1 = x1.when(side == name, e[2])
            y1 = y1.when(side == name, e[3])
    return open_sides.select(
        "region",
        class_col,
        x0.alias("x0"),
        y0.alias("y0"),
        x1.alias("x1"),
        y1.alias("y1"),
    )


#: outgoing-direction preference at a stitch vertex, given the incoming
#: direction: sharpest LEFT turn first (left > straight > right > back).
#: This is the classic boundary-following rule that keeps 4-connected
#: regions separated when two same-region cells touch only at a corner —
#: the two rings pass through the shared vertex without crossing.
def _turn_rank(din: tuple[int, int], dout: tuple[int, int]) -> int:
    cross = din[0] * dout[1] - din[1] * dout[0]
    dot = din[0] * dout[0] + din[1] * dout[1]
    if cross > 0:
        return 0  # left
    if cross == 0 and dot > 0:
        return 1  # straight
    if cross < 0:
        return 2  # right
    return 3  # U-turn (degenerate; never taken when alternatives exist)


def _stitch_rings(edges: list[tuple[int, int, int, int]]):
    """Directed boundary segments → closed rings (lists of corner vertices,
    first == last). Each edge is used exactly once; at multi-degree
    vertices the sharpest-left-turn rule picks the successor."""
    from collections import defaultdict

    out_by_start: dict[tuple[int, int], list] = defaultdict(list)
    for e in sorted(edges):
        out_by_start[(e[0], e[1])].append([e, False])  # [edge, used]
    rings = []
    for start_slot in [s for v in sorted(out_by_start) for s in out_by_start[v]]:
        if start_slot[1]:
            continue
        ring = [(start_slot[0][0], start_slot[0][1])]
        slot = start_slot
        while True:
            slot[1] = True
            e = slot[0]
            head = (e[2], e[3])
            ring.append(head)
            if head == ring[0]:
                break
            din = (e[2] - e[0], e[3] - e[1])
            cands = [s for s in out_by_start[head] if not s[1]]
            if not cands:
                raise AssertionError(
                    f"open ring at {head}: boundary edges not Eulerian"
                )
            slot = min(
                cands,
                key=lambda s: _turn_rank(
                    din, (s[0][2] - s[0][0], s[0][3] - s[0][1])
                ),
            )
        rings.append(ring)
    return rings


def _ring_area2(ring) -> int:
    """Twice the signed shoelace area (integer-exact on corner coords):
    > 0 = counter-clockwise (outer), < 0 = clockwise (hole)."""
    s = 0
    for (ax, ay), (bx, by) in zip(ring, ring[1:]):
        s += ax * by - bx * ay
    return s


def polygonize(
    raster: DataFrame, res: int, class_col: str = "cls"
) -> DataFrame:
    """Raster→vector: contiguous same-class regions as closed boundary
    rings — (<class_col>, region, ring, is_hole, seq, lon, lat), one row
    per ring vertex (first vertex repeated at seq = ring length, so each
    ring is explicitly closed).

    Outer rings are counter-clockwise, holes clockwise (``is_hole`` is the
    shoelace sign — integer-exact on corner coordinates). Rings within a
    region are numbered by their minimum boundary edge; vertices start at
    each ring's minimum edge: fully deterministic output.

    Scale: stitching is the only non-relational step and runs per region
    via ``applyInPandas`` — O(perimeter) work and memory per group. A
    planet-sized region (continental coastline) serializes one group; at
    that scale, pre-split regions along coarse tile seams and stitch
    per-tile fragments (the standard GIS tiling mitigation).
    """
    w = grid.cell_width(res)
    cls_field = raster.schema[class_col]
    out_schema = T.StructType(
        [
            cls_field,
            T.StructField("region", T.LongType(), False),
            T.StructField("ring", T.IntegerType(), False),
            T.StructField("is_hole", T.BooleanType(), False),
            T.StructField("seq", T.IntegerType(), False),
            T.StructField("lon", T.DoubleType(), False),
            T.StructField("lat", T.DoubleType(), False),
        ]
    )

    def stitch_group(pdf):
        import pandas as pd

        cls_val = pdf[class_col].iloc[0]
        region = int(pdf["region"].iloc[0])
        edges = list(
            zip(
                pdf["x0"].astype(int),
                pdf["y0"].astype(int),
                pdf["x1"].astype(int),
                pdf["y1"].astype(int),
            )
        )
        rows = []
        for ring_idx, ring in enumerate(_stitch_rings(edges)):
            hole = _ring_area2(ring) < 0
            for seq, (x, y) in enumerate(ring):
                rows.append(
                    (
                        cls_val,
                        region,
                        ring_idx,
                        hole,
                        seq,
                        x * w - 180.0,
                        y * w - 90.0,
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                class_col, "region", "ring", "is_hole", "seq", "lon", "lat",
            ],
        )

    edges = boundary_edges(raster, class_col)
    return edges.groupBy("region").applyInPandas(stitch_group, out_schema)
