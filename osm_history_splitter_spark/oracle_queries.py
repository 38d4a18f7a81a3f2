"""Driver-contract queries (spatial / membership / clipping / kNN).

Each query here runs the REAL engine operators over a deterministic
"versioned-entity world" derived from the driver's TPC-H-ish parquet tables
(TESTDATA.md), paired with an equivalent ANSI-SQL oracle for DuckDB:

- **nodes**  := ``part`` → points, lon/lat derived by integer arithmetic
  (exact in both engines);
- **ways**   := ``orders`` with node refs = ``lineitem.l_partkey`` edges;
- **relations** := supplier→nation→region hierarchy with typed members,
  including relation→relation references for the closure (J4).

The extract catalog is a literal: two overlapping strict bboxes + one
convex diamond polygon. The diamond's edges lie on 3-decimal lines
(x±y = ±59.995/60.005) while all derived points have 2-decimal coords, so no
point is within 3.5e-3 degrees of an edge — double rounding (~1e-13) can
never flip the engine's even-odd ray-cast vs the oracle's half-plane test.

Float discipline for oracle comparability: derived values use only +,-,*,/
(IEEE-exact, bit-identical across engines); no trig/log in compared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import grid
from .functions.eventpos import event_lon_lat
from .operators.hardcut import hardcut
from .operators.softcut import softcut_membership
from .plans.catalog import Extract, ExtractCatalog

# --- the derived world ------------------------------------------------------

DIAMOND = [(60.005, 0.0), (0.005, 60.0), (-59.995, 0.0), (0.005, -60.0)]

CELL_RES = 7  # cell width 1.40625 deg — binary-exact

CENTROIDS = {"mid": (0.0, 0.0), "ne": (90.0, 45.0), "diamond": (0.005, 0.0)}


def catalog() -> ExtractCatalog:
    return ExtractCatalog(
        [
            Extract.bbox("mid", -90.0, -45.0, 90.0, 45.0),
            Extract.bbox("ne", 0.0, 0.0, 180.0, 90.0),
            Extract.poly("diamond", [[list(v) for v in DIAMOND] + [list(DIAMOND[0])]]),
        ]
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def part_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → point entities. Pure int arithmetic + one exact division."""
    k = F.col("p_partkey")
    return _t(spark, sf_dir, "part").select(
        k.alias("id"),
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )


def order_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → way entities; refs = partkeys of its lineitems, in
    l_linenumber order (multiplicity preserved)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "l_partkey"))
            ).alias("pr")
        )
        .select("id", F.lit(1).alias("version"), F.col("pr.l_partkey").alias("refs"))
    )


def hierarchy_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier/nation/region → relation entities with typed members.

    supplier rel (1e6+suppkey): members = ('n', partkey) + ('w', orderkey)
    from its lineitems; nation rel (2e6+nationkey): ('r', supplier rels);
    region rel (3e6+regionkey): ('r', nation rels).
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    sup_members = li.select(
        (F.col("l_suppkey") + 1000000).alias("id"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n").alias("type"), F.col("l_partkey").alias("ref")
                ),
                F.struct(
                    F.lit("w").alias("type"), F.col("l_orderkey").alias("ref")
                ),
            )
        ).alias("m"),
    )
    nat_members = sup.select(
        (F.col("s_nationkey").cast("long") + 2000000).alias("id"),
        F.struct(
            F.lit("r").alias("type"),
            (F.col("s_suppkey") + 1000000).alias("ref"),
        ).alias("m"),
    )
    reg_members = nat.select(
        (F.col("n_regionkey").cast("long") + 3000000).alias("id"),
        F.struct(
            F.lit("r").alias("type"),
            (F.col("n_nationkey").cast("long") + 2000000).alias("ref"),
        ).alias("m"),
    )
    allm = sup_members.unionByName(nat_members).unionByName(reg_members)
    return (
        allm.groupBy("id")
        .agg(F.collect_list("m").alias("members"))
        .withColumn("version", F.lit(1))
    )


_WORLD_CACHE: dict = {}


def world_membership(spark: SparkSession, sf_dir: str):
    """Membership marker tables for the derived world; persisted and cached
    per (session, sf_dir) — the driver calls several queries that share this
    DAG, mirroring how a real split computes the markers once and serves
    all outputs from them (the two-pass structure, SURVEY §3.2)."""
    key = (id(spark), sf_dir)
    if key not in _WORLD_CACHE:
        # the marker DAG only consumes the EXPLODED reference multisets,
        # and this world derives its entity tables from normalized rows
        # (collect_list → array): hand pass 1 the pre-aggregation rows
        # and skip both wide collect_list aggregations plus their
        # re-explodes — identical markers (multiset equality), two fewer
        # shuffles on the cold path
        li = _t(spark, sf_dir, "lineitem")
        way_refs_hint = li.select(
            F.col("l_orderkey").alias("id"), F.col("l_partkey").alias("ref")
        )
        sup = _t(spark, sf_dir, "supplier")
        nat = _t(spark, sf_dir, "nation")
        rel_members_hint = (
            li.select(
                (F.col("l_suppkey") + 1000000).alias("id"),
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("n").alias("mtype"),
                            F.col("l_partkey").alias("ref"),
                        ),
                        F.struct(
                            F.lit("w").alias("mtype"),
                            F.col("l_orderkey").alias("ref"),
                        ),
                    )
                ).alias("m"),
            )
            .select("id", F.col("m.mtype").alias("mtype"), F.col("m.ref").alias("ref"))
            .unionByName(
                sup.select(
                    (F.col("s_nationkey").cast("long") + 2000000).alias("id"),
                    F.lit("r").alias("mtype"),
                    (F.col("s_suppkey") + 1000000).alias("ref"),
                )
            )
            .unionByName(
                nat.select(
                    (F.col("n_regionkey").cast("long") + 3000000).alias("id"),
                    F.lit("r").alias("mtype"),
                    (F.col("n_nationkey").cast("long") + 2000000).alias("ref"),
                )
            )
        )
        _WORLD_CACHE[key] = softcut_membership(
            part_nodes(spark, sf_dir),
            order_ways(spark, sf_dir),
            hierarchy_relations(spark, sf_dir),
            catalog(),
            persist=True,
            way_refs_hint=way_refs_hint,
            rel_members_hint=rel_members_hint,
        )
    return _WORLD_CACHE[key]


# --- oracle SQL building blocks --------------------------------------------

PTS_SQL = (
    "SELECT p_partkey AS id, "
    "((p_partkey*7919)%36000)/100.0 - 180.0 AS lon, "
    "((p_partkey*104729)%18000)/100.0 - 90.0 AS lat FROM part"
)


def _halfplanes(verts) -> str:
    conds = []
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        conds.append(
            f"(({x2!r}-({x1!r}))*(lat-({y1!r})) - ({y2!r}-({y1!r}))*(lon-({x1!r})) > 0)"
        )
    return " AND ".join(conds)


def membership_sql(cols: str, src: str = "pts") -> str:
    """Strict-bbox + convex-halfplane membership union over a point source
    with ``lon``/``lat`` columns — the oracle twin of ``assign_extracts``."""
    return (
        f"SELECT {cols}, 'mid' AS extract FROM {src} "
        "WHERE lon > -90.0 AND lat > -45.0 AND lon < 90.0 AND lat < 45.0 "
        f"UNION ALL SELECT {cols}, 'ne' AS extract FROM {src} "
        "WHERE lon > 0.0 AND lat > 0.0 AND lon < 180.0 AND lat < 90.0 "
        f"UNION ALL SELECT {cols}, 'diamond' AS extract FROM {src} "
        f"WHERE {_halfplanes(DIAMOND)}"
    )


NM_SQL = membership_sql("id")

BASE_CTES = f"""WITH pts AS ({PTS_SQL}),
nm AS ({NM_SQL}),
wm AS (SELECT DISTINCT l.l_orderkey AS id, nm.extract
       FROM lineitem l JOIN nm ON nm.id = l.l_partkey),
en AS (SELECT DISTINCT l2.l_partkey AS id, wm.extract
       FROM wm JOIN lineitem l2 ON l2.l_orderkey = wm.id)"""

REL_CTES = f"""{BASE_CTES},
rd AS (SELECT DISTINCT 1000000 + l.l_suppkey AS id, nm.extract
       FROM lineitem l JOIN nm ON nm.id = l.l_partkey
       UNION
       SELECT DISTINCT 1000000 + l.l_suppkey AS id, wm.extract
       FROM lineitem l JOIN wm ON wm.id = l.l_orderkey),
edges AS (SELECT 1000000 + s_suppkey AS child, 2000000 + s_nationkey AS parent FROM supplier
          UNION ALL
          SELECT 2000000 + n_nationkey AS child, 3000000 + n_regionkey AS parent FROM nation)"""


# --- queries ---------------------------------------------------------------


def q_node_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: node×extract spatial join — strict bboxes + exact-PIP polygon via
    the broadcast cell-cover index (reference hardcut.hpp:106-119,
    cut.hpp:34-52)."""
    from .operators.spatial_join import assign_extracts

    return assign_extracts(part_nodes(spark, sf_dir), catalog()).select(
        "id", "extract"
    )


Q_NODE_MEMBERSHIP_SQL = f"WITH pts AS ({PTS_SQL}) SELECT id, extract FROM ({NM_SQL}) m"


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: grid cell encode — pure Catalyst arithmetic, no UDF."""
    pts = part_nodes(spark, sf_dir)
    return pts.select(
        "id", grid.cell_id_expr(F.col("lon"), F.col("lat"), CELL_RES).alias("cell")
    )


Q_CELL_ASSIGN_SQL = (
    f"WITH pts AS ({PTS_SQL}) SELECT id, "
    f"{grid.cell_id_sql('lon', 'lat', CELL_RES)} AS cell FROM pts"
)


TILE_Z = 8  # slippy-map zoom for the tile twin


def q_tile_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slippy-map XYZ tile + Bing quadkey assignment at z=8 (functions/
    grid.py:tile_xy_expr,quadkey_expr) — the public web-map tile scheme,
    Web-Mercator y via the shared-literal ln/tan chain; certified against
    the independent asinh-form reference in tests/test_tiles.py."""
    pts = part_nodes(spark, sf_dir)
    tx, ty = grid.tile_xy_expr(F.col("lon"), F.col("lat"), TILE_Z)
    return pts.select(
        "id",
        tx.alias("tx"),
        ty.alias("ty"),
        grid.quadkey_expr(F.col("lon"), F.col("lat"), TILE_Z).alias("qk"),
    )


def _tile_xyz_sql() -> str:
    tx, ty = grid.tile_xy_sql("lon", "lat", TILE_Z)
    qk = grid.quadkey_sql("lon", "lat", TILE_Z)
    return (
        f"WITH pts AS ({PTS_SQL}) SELECT id, {tx} AS tx, {ty} AS ty, "
        f"{qk} AS qk FROM pts"
    )


Q_TILE_XYZ_SQL = _tile_xyz_sql()


GEOHASH_PRECISION = 6  # 30 interleave bits — ~0.6 km cells, the common web tile key


def q_geohash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encode (geohash.org base32, lon-first interleave) — the third
    public cell index next to the equal-angle grid (``cell_assign``) and the
    Morton key (``zorder``); pure Catalyst bit arithmetic, no UDF. Pinned to
    the classic algorithm in ``tests/test_geohash.py`` (incl. the published
    ``u4pruy`` fixture)."""
    pts = part_nodes(spark, sf_dir)
    return pts.select(
        "id",
        grid.geohash_expr(F.col("lon"), F.col("lat"), GEOHASH_PRECISION).alias(
            "gh"
        ),
    )


Q_GEOHASH_ASSIGN_SQL = (
    f"WITH pts AS ({PTS_SQL}) SELECT id, "
    f"{grid.geohash_sql('lon', 'lat', GEOHASH_PRECISION)} AS gh FROM pts"
)


def q_way_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: way ⋉ tracked-nodes semi-join, EXISTS semantics
    (softcut.hpp:199-211)."""
    return world_membership(spark, sf_dir).way_members.select("id", "extract")


Q_WAY_MEMBERS_SQL = f"{BASE_CTES} SELECT id, extract FROM wm"


def q_extra_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: reference-completeness back-join — all refs of all versions of
    tracked ways (softcut.hpp:98-111)."""
    return world_membership(spark, sf_dir).extra_nodes.select("id", "extract")


Q_EXTRA_NODES_SQL = f"{BASE_CTES} SELECT id, extract FROM en"


def q_softcut_nodes_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+O3: pass-2 node output ids — node ∪ extra-node trackers
    (softcut.hpp:329-342)."""
    return world_membership(spark, sf_dir).all_nodes().select("id", "extract")


Q_SOFTCUT_NODES_OUT_SQL = (
    f"{BASE_CTES} SELECT DISTINCT id, extract FROM "
    "(SELECT id, extract FROM nm UNION ALL SELECT id, extract FROM en) u"
)


def q_relation_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+J4: relation membership with transitive rel→rel closure
    (softcut.hpp:230-287)."""
    return world_membership(spark, sf_dir).relation_members.select("id", "extract")


Q_RELATION_MEMBERS_SQL = f"""{REL_CTES},
cl AS (WITH RECURSIVE c AS (
        SELECT id, extract FROM rd
        UNION
        SELECT e.parent AS id, c.extract FROM c JOIN edges e ON e.child = c.id)
      SELECT id, extract FROM c)
SELECT id, extract FROM cl"""


def q_hardcut_way_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P4: hardcut way clip — kept refs (multiplicity preserved), ways
    with ≥2 surviving refs (hardcut.hpp:150-188). Exploded for comparison."""
    empty_rels = spark.createDataFrame(
        [], "id long, version int, members array<struct<type:string,ref:long>>"
    )
    res = hardcut(
        part_nodes(spark, sf_dir),
        order_ways(spark, sf_dir),
        empty_rels,
        catalog(),
    )
    return res.ways.select(
        F.col("id").alias("way_id"), "extract", F.explode("refs").alias("ref")
    )


Q_HARDCUT_WAY_CLIP_SQL = f"""{BASE_CTES},
kept AS (SELECT l.l_orderkey AS way_id, nm.extract, l.l_partkey AS ref
         FROM lineitem l JOIN nm ON nm.id = l.l_partkey),
ok AS (SELECT way_id, extract FROM kept GROUP BY way_id, extract HAVING count(*) >= 2)
SELECT k.way_id, k.extract, k.ref FROM kept k JOIN ok USING (way_id, extract)"""


def q_hardcut_relation_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: hardcut relation-member clip, types n/w only, ways tracked only
    when actually written (hardcut.hpp:228-251 + :195)."""
    res = hardcut(
        part_nodes(spark, sf_dir),
        order_ways(spark, sf_dir),
        hierarchy_relations(spark, sf_dir),
        catalog(),
    )
    return res.relations.select(
        F.col("id").alias("rel_id"), "extract", F.explode("members").alias("m")
    ).select(
        "rel_id",
        "extract",
        F.col("m.type").alias("mtype"),
        F.col("m.ref").alias("ref"),
    )


Q_HARDCUT_RELATION_CLIP_SQL = f"""{BASE_CTES},
kept AS (SELECT l.l_orderkey AS way_id, nm.extract, l.l_partkey AS ref
         FROM lineitem l JOIN nm ON nm.id = l.l_partkey),
wt AS (SELECT way_id, extract FROM kept GROUP BY way_id, extract HAVING count(*) >= 2),
keptm AS (
  SELECT 1000000 + l.l_suppkey AS rel_id, nm.extract, 'n' AS mtype, l.l_partkey AS ref
  FROM lineitem l JOIN nm ON nm.id = l.l_partkey
  UNION ALL
  SELECT 1000000 + l.l_suppkey AS rel_id, wt.extract, 'w' AS mtype, l.l_orderkey AS ref
  FROM lineitem l JOIN wt ON wt.way_id = l.l_orderkey)
SELECT rel_id, extract, mtype, ref FROM keptm"""


def q_knn_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-to-extract-centroid (north_rule): top-10 nodes per extract by
    squared planar distance (IEEE-exact; tie-break by id)."""
    from pyspark.sql import Window

    pts = part_nodes(spark, sf_dir)
    cents = spark.createDataFrame(
        [(n, float(c[0]), float(c[1])) for n, c in CENTROIDS.items()],
        "extract string, cx double, cy double",
    )
    d = pts.crossJoin(F.broadcast(cents)).withColumn(
        "dist2",
        (F.col("lon") - F.col("cx")) * (F.col("lon") - F.col("cx"))
        + (F.col("lat") - F.col("cy")) * (F.col("lat") - F.col("cy")),
    )
    w = Window.partitionBy("extract").orderBy(F.col("dist2").asc(), F.col("id").asc())
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("extract", "rnk", "id")
    )


IDW_RADIUS = 15.0  # degrees


def q_idw_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation (operators/knn.py:
    idw_interpolate) of an integer point attribute at 25 nation-derived
    query points — integer-exact weights, so the weighted mean is
    reproducible under any reduce order."""
    from .operators.knn import idw_interpolate

    pts = part_nodes(spark, sf_dir).withColumn(
        "val", (F.col("id") % 1000).cast("long")
    )
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    qpts = n.select(
        k.cast("long").alias("qid"),
        ((k * 131) % 360 - 180 + F.lit(0.5)).cast("double").alias("qx"),
        ((k * 197) % 180 - 90 + F.lit(0.5)).cast("double").alias("qy"),
    )
    return idw_interpolate(pts, qpts, IDW_RADIUS)


Q_IDW_INTERPOLATE_SQL = f"""WITH pts AS ({PTS_SQL}),
q AS (SELECT CAST(n_nationkey AS BIGINT) AS qid,
             CAST((n_nationkey * 131) % 360 - 180 + 0.5 AS DOUBLE) AS qx,
             CAST((n_nationkey * 197) % 180 - 90 + 0.5 AS DOUBLE) AS qy
      FROM nation),
d AS (SELECT q.qid, p.id % 1000 AS val,
        (p.lon - q.qx)*(p.lon - q.qx) + (p.lat - q.qy)*(p.lat - q.qy) AS d2
      FROM pts p CROSS JOIN q),
w AS (SELECT qid, val,
        {100_000_000} // (100 + CAST(floor(d2 * 10000.0) AS BIGINT)) AS w
      FROM d WHERE d2 < {IDW_RADIUS * IDW_RADIUS!r})
SELECT qid, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(w * val) // sum(w) AS BIGINT) AS idw_val
FROM w GROUP BY 1"""


_CENT_VALUES = ", ".join(
    f"('{n}', {c[0]!r}, {c[1]!r})" for n, c in CENTROIDS.items()
)
Q_KNN_CENTROID_SQL = f"""WITH pts AS ({PTS_SQL}),
cents(extract, cx, cy) AS (VALUES {_CENT_VALUES}),
d AS (SELECT c.extract, p.id,
        (p.lon - c.cx)*(p.lon - c.cx) + (p.lat - c.cy)*(p.lat - c.cy) AS dist2
      FROM pts p CROSS JOIN cents c),
r AS (SELECT extract, id,
        row_number() OVER (PARTITION BY extract ORDER BY dist2 ASC, id ASC) AS rnk
      FROM d)
SELECT extract, rnk, id FROM r WHERE rnk <= 10"""


def q_pages_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship web-text split (north_star): geotags parsed from page
    text by the vectorized pandas UDF, softcut url-level membership (any
    snapshot inside ⇒ all snapshots out), one row per (url, ver, extract)."""
    from .functions.geotags import extract_geotags
    from .operators.spatial_join import assign_extracts
    from .sources.pages import synth_pages

    pages = synth_pages(spark, sf_dir)
    pts = pages.select(
        "url", F.explode(extract_geotags(F.col("text"))).alias("g")
    ).select("url", F.col("g.lat").alias("lat"), F.col("g.lon").alias("lon"))
    # the spatial join consumes pts in several union branches (accept /
    # bbox-refine / poly-refine): persist so the pandas-UDF extraction runs
    # once, not once per branch
    pts = pts.persist()
    members = assign_extracts(pts, catalog()).select("url", "extract").distinct()
    return pages.join(members, "url").select("url", "ver", "extract")


def _pages_ctes() -> str:
    from .sources.pages import PAGES_SQL

    pattern = r"GEO\(latc=(-?\d+);lonc=(-?\d+)\)"
    return f"""WITH pages AS ({PAGES_SQL}),
pts AS (SELECT url,
  CAST(regexp_extract(text, '{pattern}', 1) AS BIGINT) / 100.0 AS lat,
  CAST(regexp_extract(text, '{pattern}', 2) AS BIGINT) / 100.0 AS lon
  FROM pages),
m AS (SELECT DISTINCT url, extract FROM ({membership_sql('url')}) u)"""


Q_PAGES_SPLIT_SQL = (
    _pages_ctes()
    + "\nSELECT p.url, p.ver, m.extract FROM pages p JOIN m USING (url)"
)


def q_pages_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant (input_hint): emitted page text is the
    original row's bytes — md5 over the OUTPUT rows must equal md5 over the
    independently-derived input (reference softcut.hpp:357-370 writes
    objects unmodified)."""
    from .functions.geotags import extract_geotags
    from .operators.spatial_join import assign_extracts
    from .sources.pages import synth_pages

    pages = synth_pages(spark, sf_dir)
    pts = pages.select(
        "url", F.explode(extract_geotags(F.col("text"))).alias("g")
    ).select("url", F.col("g.lat").alias("lat"), F.col("g.lon").alias("lon"))
    members = assign_extracts(pts, catalog()).select("url", "extract").distinct()
    return pages.join(members, "url").select(
        "url", "ver", "extract", F.md5(F.col("text").cast("binary")).alias("text_md5")
    )


Q_PAGES_PASSTHROUGH_SQL = (
    _pages_ctes()
    + "\nSELECT p.url, p.ver, m.extract, md5(p.text) AS text_md5 "
    "FROM pages p JOIN m USING (url)"
)


RASTER_RES = 5  # 5.625-deg cells — binary-exact width


def q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector→raster: per-cell count + value band (customer points weighted
    by integer-cents acctbal — exact in both engines)."""
    from .operators.raster import rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    return rasterize(pts, RASTER_RES, value_col="cents").select(
        "cell", F.col("n").alias("n"), F.col("sum_val").alias("sum_cents")
    )


_CUST_PTS_SQL = (
    "SELECT ((c_custkey*7919)%36000)/100.0 - 180.0 AS lon, "
    "((c_custkey*104729)%18000)/100.0 - 90.0 AS lat, "
    "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer"
)
Q_RASTERIZE_SQL = (
    f"WITH pts AS ({_CUST_PTS_SQL}) "
    f"SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell, "
    "count(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents FROM pts GROUP BY 1"
)


def q_raster_morphology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morphological dilate/erode on the customer-point raster
    (operators/raster.py:dilate,erode): every cell of the 1-step dilation,
    flagged with base membership and erosion survival. Dilation by k cells
    is the grid-quantized outward polygon buffer; erosion needs the full
    3x3 neighborhood present (domain edges zero-padded). One explode + one
    aggregate per op — no k-round iteration, no UDF."""
    from .operators.raster import dilate, erode, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    base = rasterize(pts, RASTER_RES).select("cell")
    d = dilate(base, RASTER_RES, 1)
    b = base.withColumn("in_base", F.lit(True))
    e = erode(base, RASTER_RES, 1).withColumn("in_eroded", F.lit(True))
    return (
        d.join(b, "cell", "left")
        .join(e, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("in_base"), F.lit(False)).alias("in_base"),
            F.coalesce(F.col("in_eroded"), F.lit(False)).alias("in_eroded"),
        )
    )


def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin→destination flow matrix — the spatio-temporal composition:
    sessionize (30-min gap, the q_sessionize expression verbatim) ×
    grid cell encode (deterministic per-event positions, the synthetic
    lat/lon convention) × flow aggregation. Each session contributes one
    trip from its FIRST event's cell to its LAST event's cell (order =
    (ts, event_id), dual row_number marks — no self-join); flows are the
    per-(o_cell, d_cell) trip counts, the mobility-analytics primitive
    (commute matrices, tile-to-tile demand).

    Scale shape: ONE shuffle by user_id feeds both the session windows
    and the first/last marks; the flow groupBy is map-side combinable
    and its cardinality is bounded by cells², not trips."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    k, e = F.col("user_id"), F.col("event_id")
    lon, lat = event_lon_lat(k, e)
    pos = ev.select(
        "user_id",
        "event_id",
        "ts",
        grid.cell_id_expr(lon, lat, RASTER_RES).alias("cell"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = pos.withColumn(
        "new_sess",
        F.when(
            F.unix_timestamp(F.col("ts"))
            - F.lag(F.unix_timestamp(F.col("ts")), 1, 0).over(w)
            > 1800,
            1,
        ).otherwise(0),
    ).withColumn(
        "sess_no",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    w2 = Window.partitionBy("user_id", "sess_no").orderBy("ts", "event_id")
    w2d = Window.partitionBy("user_id", "sess_no").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = sess.select(
        "user_id",
        "sess_no",
        "cell",
        F.row_number().over(w2).alias("rn"),
        F.row_number().over(w2d).alias("rnd"),
    )
    od = marked.groupBy("user_id", "sess_no").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cell"))).alias("o_cell"),
        F.max(F.when(F.col("rnd") == 1, F.col("cell"))).alias("d_cell"),
    )
    return od.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_trips")
    )


def _od_matrix_sql() -> str:
    cell = grid.cell_id_sql(
        "((user_id * 7919 + event_id * 13) % 36000) / 100.0 - 180.0",
        "((user_id * 104729 + event_id * 29) % 18000) / 100.0 - 90.0",
        RASTER_RES,
    )
    return f"""WITH pos AS (
  SELECT user_id, event_id, ts, {cell} AS cell FROM events),
g AS (
  SELECT *, CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
          - lag(CAST(floor(epoch(ts)) AS BIGINT), 1, 0)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
      THEN 1 ELSE 0 END AS new_sess
  FROM pos),
s0 AS (
  SELECT user_id, event_id, ts, cell,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sess_no
  FROM g),
s AS (
  SELECT user_id, sess_no, cell,
         row_number() OVER (PARTITION BY user_id, sess_no
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, sess_no
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM s0),
od AS (
  SELECT user_id, sess_no,
         max(CASE WHEN rn = 1 THEN cell END) AS o_cell,
         max(CASE WHEN rnd = 1 THEN cell END) AS d_cell
  FROM s GROUP BY 1, 2)
SELECT o_cell, d_cell, CAST(count(*) AS BIGINT) AS n_trips
FROM od GROUP BY 1, 2"""


#: Mann-Kendall space-time cube: coarse cells (res 2 = 45° — ~32 bins
#: over the synthetic position lattice) × epoch-day periods, so each
#: cell sees a ~30-rung daily series at sf0.001 (res 5 would leave ~1.5
#: periods/cell — a vacuous trend).
MK_RES = 2


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot trend (operators/raster.py:mann_kendall_trend):
    events → coarse cell × epoch-day counts → per-cell Mann-Kendall S
    and 18·Var(S), integer-exact — the space-time-cube "is this cell
    heating up?" statistic. One combinable groupBy builds the cube, one
    groupBy(cell) collects each bounded daily series, the O(n²) pair
    scan runs IN-ROW via higher-order array functions (no time
    self-join, no Python)."""
    from .operators.raster import mann_kendall_trend

    ev = _t(spark, sf_dir, "events")
    k, e = F.col("user_id"), F.col("event_id")
    lon, lat = event_lon_lat(k, e)
    cube = (
        ev.select(
            grid.cell_id_expr(lon, lat, MK_RES).alias("cell"),
            (F.unix_timestamp(F.col("ts")) / F.lit(86400))
            .cast("long")
            .alias("period"),
        )
        .groupBy("cell", "period")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    return mann_kendall_trend(cube)


def _mk_trend_sql() -> str:
    cell = grid.cell_id_sql(
        "((user_id * 7919 + event_id * 13) % 36000) / 100.0 - 180.0",
        "((user_id * 104729 + event_id * 29) % 18000) / 100.0 - 90.0",
        MK_RES,
    )
    return f"""WITH cube AS (
  SELECT {cell} AS cell,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS period,
         CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
s AS (
  SELECT a.cell,
         sum(CASE WHEN b.v > a.v THEN 1
                  WHEN b.v < a.v THEN -1 ELSE 0 END) AS s_stat
  FROM cube a JOIN cube b ON a.cell = b.cell AND a.period < b.period
  GROUP BY a.cell),
ties AS (
  SELECT cell, sum(t * (t - 1) * (2 * t + 5)) AS tie
  FROM (SELECT cell, v, count(*) AS t FROM cube GROUP BY cell, v)
  GROUP BY cell),
n AS (SELECT cell, CAST(count(*) AS BIGINT) AS np FROM cube GROUP BY cell)
SELECT n.cell, n.np AS n_periods,
  CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
  CAST(n.np * (n.np - 1) * (2 * n.np + 5) - coalesce(ties.tie, 0)
       AS BIGINT) AS var_s_18
FROM n LEFT JOIN s ON s.cell = n.cell LEFT JOIN ties ON ties.cell = n.cell"""


#: trajectory layer: coarse cells (MK_RES) make the synthetic users'
#: slow per-user drift (user term dominates the position hash) produce
#: real multi-event dwell runs; τ = 2 days yields a non-vacuous
#: co-location graph at sf0.001 (11 user pairs / 886 meetings).
COLOC_TAU = 172800


def _event_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k, e = F.col("user_id"), F.col("event_id")
    lon, lat = event_lon_lat(k, e)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts")).alias("tse"),
        grid.cell_id_expr(lon, lat, MK_RES).alias("cell"),
    )


def _event_pos_sql() -> str:
    cell = grid.cell_id_sql(
        "((user_id * 7919 + event_id * 13) % 36000) / 100.0 - 180.0",
        "((user_id * 104729 + event_id * 29) % 18000) / 100.0 - 90.0",
        MK_RES,
    )
    return (
        f"SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse, "
        f"{cell} AS cell FROM events"
    )


def q_dwell_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point / dwell detection (operators/trajectory.py:
    dwell_segments): maximal same-cell runs per user (≥ 2 events) with
    enter/exit times — the grid-quantized GeoLife stay-point, as ONE
    user-shuffle window pass + a combinable groupBy, integer-exact."""
    from .operators.trajectory import dwell_segments

    return dwell_segments(_event_pos(spark, sf_dir), min_events=2)


def _dwell_segments_sql() -> str:
    return f"""WITH pos AS ({_event_pos_sql()}),
r AS (
  SELECT *, CASE WHEN cell = lag(cell) OVER
      (PARTITION BY user_id ORDER BY tse, event_id) THEN 0 ELSE 1 END
    AS new_run
  FROM pos),
s AS (
  SELECT *, CAST(SUM(new_run) OVER (PARTITION BY user_id
      ORDER BY tse, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS run_no
  FROM r)
SELECT user_id, cell, CAST(min(tse) AS BIGINT) AS enter_ts,
  CAST(max(tse) AS BIGINT) AS exit_ts,
  CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, run_no, cell HAVING count(*) >= 2"""


def q_colocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-location / co-visitation graph (operators/trajectory.py:
    colocation_pairs): distinct-user event pairs sharing a cell within
    τ = 2 days, aggregated per unordered user pair — the contact-graph
    join, as a (cell, τ-bucket) hash equi-join with ±1-bucket one-sided
    replication (exactly-once by construction: replicas occupy distinct
    buckets — no post-join distinct; plan-asserted in
    tests/test_trajectory.py)."""
    from .operators.trajectory import colocation_pairs

    return colocation_pairs(_event_pos(spark, sf_dir), tau=COLOC_TAU)


def _colocation_sql() -> str:
    return f"""WITH pos AS ({_event_pos_sql()})
SELECT a.user_id AS user_a, b.user_id AS user_b,
  CAST(count(*) AS BIGINT) AS n_meetings,
  CAST(min(abs(a.tse - b.tse)) AS BIGINT) AS min_gap
FROM pos a JOIN pos b
  ON a.cell = b.cell AND a.user_id < b.user_id
  AND abs(a.tse - b.tse) <= {COLOC_TAU}
GROUP BY 1, 2"""


#: Hausdorff similarity-join radius (centidegrees). Trajectory boxes are
#: 90×90 (diagonal ≈ 125.9 < 128), so same-cluster pairs always pass the
#: coverage gate — non-vacuous at every SF by construction.
HAUS_RADIUS = 128


def _traj_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered synthetic trajectories: users 2c and 2c+1 walk inside
    the same 90×90 centidegree box (cluster c's slot on a 100-pitch
    grid), so every cluster yields one qualifying trajectory pair while
    cross-cluster pairs only qualify when their slots happen to abut —
    selective AND non-vacuous at every SF (events/user is SF-constant)."""
    ev = _t(spark, sf_dir, "events")
    k, e = F.col("user_id").cast("long"), F.col("event_id").cast("long")
    c = ((k - k % 2) / 2).cast("long")
    return ev.select(
        k.alias("tid"),
        (((c * 997) % 360) * 100 + (k * 7919 + e * 13) % 90).alias("xs"),
        (((c * 641) % 179) * 100 + (k * 104729 + e * 29) % 90).alias("ys"),
    )


_TRAJ_POS_SQL = """SELECT user_id AS tid,
  (((user_id // 2) * 997) % 360) * 100
    + (user_id * 7919 + event_id * 13) % 90 AS xs,
  (((user_id // 2) * 641) % 179) * 100
    + (user_id * 104729 + event_id * 29) % 90 AS ys
FROM events"""


def q_hausdorff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory-similarity join (operators/trajectory.py:
    hausdorff_join): all unordered trajectory pairs with symmetric
    Hausdorff distance ≤ HAUS_RADIUS, with the exact squared distance —
    ONE grid ε-join (×9 map-side replication, no CartesianProduct) +
    two combinable groupBys + a coverage gate that makes the threshold
    join distance-exact. The twin computes the TRUE Hausdorff from the
    full n² pair set and filters at the end — certifying both the grid
    candidate completeness and the coverage-gate semantics."""
    from .operators.trajectory import hausdorff_join

    return hausdorff_join(_traj_pos(spark, sf_dir), HAUS_RADIUS)


Q_HAUSDORFF_SQL = f"""WITH pos AS (
  SELECT DISTINCT * FROM ({_TRAJ_POS_SQL})
),
cand AS (
  SELECT a.tid AS ta, b.tid AS tb, a.xs AS xa, a.ys AS ya,
         (a.xs - b.xs) * (a.xs - b.xs)
           + (a.ys - b.ys) * (a.ys - b.ys) AS d2
  FROM pos a JOIN pos b ON a.tid < b.tid
),
mina AS (
  SELECT ta, tb, xa, ya, min(d2) AS md FROM cand GROUP BY 1, 2, 3, 4
),
ha AS (SELECT ta, tb, max(md) AS h2a FROM mina GROUP BY 1, 2),
candb AS (
  SELECT a.tid AS ta, b.tid AS tb, b.xs AS xb, b.ys AS yb,
         (a.xs - b.xs) * (a.xs - b.xs)
           + (a.ys - b.ys) * (a.ys - b.ys) AS d2
  FROM pos a JOIN pos b ON a.tid < b.tid
),
minb AS (
  SELECT ta, tb, xb, yb, min(d2) AS md FROM candb GROUP BY 1, 2, 3, 4
),
hb AS (SELECT ta, tb, max(md) AS h2b FROM minb GROUP BY 1, 2)
SELECT ta AS tid_a, tb AS tid_b,
  CAST(greatest(h2a, h2b) AS BIGINT) AS h2
FROM ha JOIN hb USING (ta, tb)
WHERE greatest(h2a, h2b) <= {HAUS_RADIUS * HAUS_RADIUS}"""


def q_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory summary (operators/trajectory.py:
    trajectory_stats): event count, time span, total/max squared step,
    net first→last displacement — the mobility/bot-detection feature
    vector, integer-exact. ONE user shuffle feeds the lag window, both
    first/last marks and the groupBy (single Exchange, no joins)."""
    from .operators.trajectory import trajectory_stats

    ev = _t(spark, sf_dir, "events")
    k, e = F.col("user_id").cast("long"), F.col("event_id").cast("long")
    pos = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts")).alias("tse"),
        ((k * 7919 + e * 13) % 36000).alias("xs"),
        ((k * 104729 + e * 29) % 18000).alias("ys"),
    )
    return trajectory_stats(pos)


Q_TRAJECTORY_STATS_SQL = """WITH pos AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse,
    (user_id * 7919 + event_id * 13) % 36000 AS xs,
    (user_id * 104729 + event_id * 29) % 18000 AS ys
  FROM events
),
s AS (
  SELECT user_id, tse, xs, ys,
    xs - lag(xs) OVER w AS dx, ys - lag(ys) OVER w AS dy,
    row_number() OVER w AS rn_a,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY tse DESC, event_id DESC) AS rn_d
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
),
g AS (
  SELECT user_id,
    count(*) AS n_events,
    max(CASE WHEN rn_d = 1 THEN tse END)
      - max(CASE WHEN rn_a = 1 THEN tse END) AS duration,
    coalesce(sum(dx * dx + dy * dy), 0) AS sum_step2,
    coalesce(max(dx * dx + dy * dy), 0) AS max_step2,
    max(CASE WHEN rn_d = 1 THEN xs END)
      - max(CASE WHEN rn_a = 1 THEN xs END) AS ndx,
    max(CASE WHEN rn_d = 1 THEN ys END)
      - max(CASE WHEN rn_a = 1 THEN ys END) AS ndy
  FROM s GROUP BY 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
  CAST(duration AS BIGINT) AS duration,
  CAST(sum_step2 AS BIGINT) AS sum_step2,
  CAST(max_step2 AS BIGINT) AS max_step2,
  CAST(ndx * ndx + ndy * ndy AS BIGINT) AS net_disp2
FROM g"""


#: hotspot NMS neighborhood radius (Chebyshev cells)
HOTSPOT_K = 2


def q_hotspot_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotspot detection (operators/raster.py:local_maxima): the cells of
    the customer density raster that dominate their full Chebyshev-2
    neighborhood, ties to the lowest cell id — non-maximum suppression,
    the heatmap→POI step after rasterize/box_blur. One explode + one
    max(struct) groupBy; the twin replays the scatter with a
    row_number() window."""
    from .operators.raster import local_maxima, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    base = rasterize(pts, RASTER_RES)
    out = local_maxima(base, RASTER_RES, k=HOTSPOT_K, value_col="n")
    return out.select("cell", F.col("n").cast("long").alias("n"))


def _hotspot_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    offs = ", ".join(str(d) for d in range(-HOTSPOT_K, HOTSPOT_K + 1))
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell, count(*) AS n
  FROM pts GROUP BY 1
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell,
         n, cell AS src
  FROM base,
       LATERAL (SELECT unnest([{offs}]) AS dx),
       LATERAL (SELECT unnest([{offs}]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
), w AS (
  SELECT ncell AS cell, n, src,
         row_number() OVER (PARTITION BY ncell
                            ORDER BY n DESC, src ASC) AS rn
  FROM nb)
SELECT cell, CAST(n AS BIGINT) AS n FROM w WHERE rn = 1 AND src = cell"""


#: hex-bin edge (degrees) for the aggregation-lattice query
HEX_SIZE = 2.0


def q_hexbin_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal binning (functions/grid.py:hexbin_expr): per-hex counts
    of the customer points on a pointy-top axial lattice — the
    corner-bias-free aggregation grid (H3's reason to exist), as a pure
    Catalyst encode (IEEE +,−,×,÷,floor,abs only — deterministic across
    Spark/DuckDB/CPython, certified three ways) + ONE combinable
    groupBy."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lon = ((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)
    lat = ((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)
    hq, hr = grid.hexbin_expr(lon, lat, HEX_SIZE)
    return (
        c.select(hq.alias("hq"), hr.alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _hexbin_sql() -> str:
    lon = "((c_custkey * 7919) % 36000) / 100.0 - 180.0"
    lat = "((c_custkey * 104729) % 18000) / 100.0 - 90.0"
    hq, hr = grid.hexbin_sql(lon, lat, HEX_SIZE)
    return (
        f"SELECT {hq} AS hq, {hr} AS hr, CAST(count(*) AS BIGINT) AS n "
        f"FROM customer GROUP BY 1, 2"
    )


def q_raster_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface gradient + D8 ascent (operators/raster.py:
    raster_gradient): per cell of the customer density raster, the
    central-difference (gx, gy) and the D8 index of the steepest-ascent
    neighbor (ties → lowest index, flat → −1) — the DEM slope/flow
    primitive on a density surface. ONE 9× scatter + ONE combinable
    groupBy; integer-exact."""
    from .operators.raster import raster_gradient, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    return raster_gradient(rasterize(pts, RASTER_RES), RASTER_RES)


def _raster_gradient_sql() -> str:
    from .operators.raster import D8_OFFSETS

    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    vcols = ",\n    ".join(
        f"coalesce(max(CASE WHEN rdx = {dx} AND rdy = {dy} THEN n END), 0)"
        f" AS v{i}"
        for i, (dx, dy) in enumerate(D8_OFFSETS)
    )
    first_match = " ".join(
        f"WHEN v{i} = mv THEN {i}" for i in range(len(D8_OFFSETS))
    )
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell, count(*) AS n
  FROM pts GROUP BY 1
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell,
         -dx AS rdx, -dy AS rdy, n
  FROM base,
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
), g AS (
  SELECT ncell AS cell,
    max(CASE WHEN rdx = 0 AND rdy = 0 THEN n END) AS v_self,
    {vcols}
  FROM nb GROUP BY 1
), m AS (
  SELECT *, greatest(v0, v1, v2, v3, v4, v5, v6, v7) AS mv
  FROM g WHERE v_self IS NOT NULL
)
SELECT cell, CAST(v0 - v4 AS BIGINT) AS gx, CAST(v2 - v6 AS BIGINT) AS gy,
  CAST(CASE WHEN mv <= 0 THEN -1 {first_match} END AS BIGINT) AS d8
FROM m"""


def _raster_morphology_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT DISTINCT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell FROM pts
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell
  FROM base,
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
), dil AS (
  SELECT DISTINCT ncell AS cell FROM nb
), ero AS (
  SELECT ncell AS cell FROM nb GROUP BY 1 HAVING count(*) = 9
)
SELECT d.cell,
       b.cell IS NOT NULL AS in_base,
       e.cell IS NOT NULL AS in_eroded
FROM dil d
LEFT JOIN base b ON d.cell = b.cell
LEFT JOIN ero e ON d.cell = e.cell"""


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I (operators/raster.py:morans_i) over the customer
    density raster with queen (Chebyshev-1) contiguity — the standard
    clustered-vs-dispersed spatial-autocorrelation statistic, emitted as
    exact integers (i_num, i_den with I = i_num/i_den) so the DuckDB twin
    hash-matches without float risk. The twin replays the same scatter +
    cell equi-join in SQL."""
    from .operators.raster import morans_i, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    base = rasterize(pts, RASTER_RES)
    return morans_i(base, RASTER_RES, k=1, value_col="n")


def _morans_i_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
         CAST(count(*) AS BIGINT) AS x
  FROM pts GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(x) AS BIGINT) AS s
  FROM base
), d AS (
  SELECT cell, st.n_cells * x - st.s AS d FROM base, st
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell,
         cell AS src, d AS d_src
  FROM d,
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE NOT (dx = 0 AND dy = 0)
    AND cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
), pr AS (
  SELECT nb.d_src, d2.d AS d_dst FROM nb JOIN d d2 ON d2.cell = nb.ncell
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS w_sum,
         CAST(coalesce(sum(d_src * d_dst), 0) AS BIGINT) AS num_core
  FROM pr
), den AS (
  SELECT CAST(sum(d * d) AS BIGINT) AS den_core FROM d
)
SELECT st.n_cells,
       agg.w_sum,
       CAST(st.n_cells * agg.num_core AS BIGINT) AS i_num,
       CAST(agg.w_sum * den.den_core AS BIGINT) AS i_den
FROM st, agg, den"""


def q_getis_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* local hotspot scores
    (operators/raster.py:getis_ord_g) over the customer density raster
    with queen (Chebyshev-1) contiguity including self — the per-cell
    complement of `morans_i`, emitted as exact integers
    (g_num, g_den_sq with z = g_num·sqrt((n-1)/g_den_sq)) so the DuckDB
    twin hash-matches without float risk. The twin replays the same
    self-inclusive scatter + cell equi-join in SQL."""
    from .operators.raster import getis_ord_g, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    base = rasterize(pts, RASTER_RES)
    return getis_ord_g(base, RASTER_RES, k=1, value_col="n")


def _getis_hotspots_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
         CAST(count(*) AS BIGINT) AS x
  FROM pts GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM base
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell,
         x
  FROM base,
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
), loc AS (
  SELECT ncell AS cell,
         CAST(sum(x) AS BIGINT) AS l_sum,
         CAST(count(*) AS BIGINT) AS w_i
  FROM nb GROUP BY 1
)
SELECT base.cell,
       loc.w_i,
       CAST(st.n_cells * loc.l_sum - st.s * loc.w_i AS BIGINT) AS g_num,
       CAST((st.n_cells * st.q - st.s * st.s)
            * (st.n_cells * loc.w_i - loc.w_i * loc.w_i) AS BIGINT)
         AS g_den_sq
FROM base JOIN loc ON loc.cell = base.cell, st"""


def q_region_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component region labeling
    (operators/raster.py:region_label) over the customer density raster
    with queen (Chebyshev-1) connectivity — the raster dissolve: every
    occupied cell tagged with the min cell id of its connected blob.
    The twin resolves the same adjacency with a recursive CTE
    (min reachable cell id), certifying the pointer-jumping label
    propagation against textbook transitive closure."""
    from .operators.raster import rasterize, region_label

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    base = rasterize(pts, RASTER_RES)
    return region_label(base, RASTER_RES, k=1)


def _region_label_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    return f"""WITH RECURSIVE pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell
  FROM pts GROUP BY 1
), edges AS (
  SELECT b.cell AS a,
         (b.cell // {shift} + dx) * {shift} + (b.cell % {shift} + dy) AS b
  FROM base b,
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE NOT (dx = 0 AND dy = 0)
    AND b.cell // {shift} + dx BETWEEN 0 AND {mx}
    AND b.cell % {shift} + dy BETWEEN 0 AND {my}
    AND (b.cell // {shift} + dx) * {shift} + (b.cell % {shift} + dy)
        IN (SELECT cell FROM base)
), reach(cell, lbl) AS (
  SELECT cell, cell FROM base
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.cell
)
SELECT cell, CAST(min(lbl) AS BIGINT) AS region FROM reach GROUP BY cell"""


Q_RASTER_MORPHOLOGY_SQL = _raster_morphology_sql()
Q_HOTSPOT_CELLS_SQL = _hotspot_sql()
Q_OD_MATRIX_SQL = _od_matrix_sql()
Q_MORANS_I_SQL = _morans_i_sql()
Q_GETIS_HOTSPOTS_SQL = _getis_hotspots_sql()
Q_REGION_LABEL_SQL = _region_label_sql()


BLUR_K = 2


def q_raster_blur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-kernel heatmap smoothing (operators/raster.py:box_blur): per-cell
    Chebyshev-2 neighborhood sums of point count and integer cents. The
    Spark side is the SEPARABLE two-pass filter (2·(2k+1) explode); the
    oracle is the direct 25-cell 2-D sum — the separability equivalence is
    what the twin certifies."""
    from .operators.raster import box_blur, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    base = rasterize(pts, RASTER_RES, value_col="cents").select(
        "cell", "n", F.col("sum_val").alias("cents")
    )
    return box_blur(base, RASTER_RES, BLUR_K, value_cols=("n", "cents")).select(
        "cell",
        F.col("n").cast("long").alias("blur_n"),
        F.col("cents").cast("long").alias("blur_cents"),
    )


def _raster_blur_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1
    k = BLUR_K
    offs = ", ".join(str(d) for d in range(-k, k + 1))
    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
         count(*) AS n, SUM(cents) AS cents
  FROM pts GROUP BY 1
), nb AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS ncell,
         n, cents
  FROM base,
       LATERAL (SELECT unnest([{offs}]) AS dx),
       LATERAL (SELECT unnest([{offs}]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
)
SELECT ncell AS cell, CAST(sum(n) AS BIGINT) AS blur_n,
       CAST(sum(cents) AS BIGINT) AS blur_cents
FROM nb GROUP BY 1"""


Q_RASTER_BLUR_SQL = _raster_blur_sql()


def q_kde_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KDE-style density surface: THREE chained box blurs (k=1) over the
    customer count raster — the classic "3 box passes ≈ Gaussian" trick
    (the composed kernel is the quadratic B-spline, within 3% of a
    Gaussian σ≈1.7 cells), kept integer-exact because box sums never
    leave ℤ. Each pass is the SEPARABLE two-pass filter, so the total
    explode factor is 3·2·3 = 18 rows/cell vs 49 for one direct 7×7
    kernel — same asymptotic win a GPU separable convolution makes. The
    twin chains the direct 9-cell 2-D sum three times, certifying the
    whole composition."""
    from .operators.raster import box_blur, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    out = rasterize(pts, RASTER_RES).select("cell", "n")
    for _ in range(3):
        out = box_blur(out, RASTER_RES, 1, value_cols=("n",))
    return out.select("cell", F.col("n").cast("long").alias("kde_n"))


def _kde_heatmap_sql() -> str:
    shift = grid.CELL_SHIFT
    mx = (1 << (RASTER_RES + 1)) - 1
    my = (1 << RASTER_RES) - 1

    def blur(src: str, dst: str) -> str:
        return f"""{dst} AS (
  SELECT (cell // {shift} + dx) * {shift} + (cell % {shift} + dy) AS cell,
         CAST(sum(n) AS BIGINT) AS n
  FROM {src},
       LATERAL (SELECT unnest([-1, 0, 1]) AS dx),
       LATERAL (SELECT unnest([-1, 0, 1]) AS dy)
  WHERE cell // {shift} + dx BETWEEN 0 AND {mx}
    AND cell % {shift} + dy BETWEEN 0 AND {my}
  GROUP BY 1)"""

    return f"""WITH pts AS ({_CUST_PTS_SQL}),
base AS (
  SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
         CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY 1),
{blur('base', 'b1')},
{blur('b1', 'b2')},
{blur('b2', 'b3')}
SELECT cell, n AS kde_n FROM b3"""


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution tile rollup (operators/raster.py:tile_pyramid):
    levels res..res-2, each aggregated from the PREVIOUS level (4 children
    -> 1 parent), never from raw points."""
    from .operators.raster import rasterize, tile_pyramid

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    return tile_pyramid(
        rasterize(pts, RASTER_RES, value_col="cents"), RASTER_RES, RASTER_RES - 2
    )


def _parent_sql(cell: str) -> str:
    s = grid.CELL_SHIFT
    return f"(({cell} // {s}) // 2) * {s} + (({cell} % {s}) // 2)"


Q_TILE_PYRAMID_SQL = f"""WITH pts AS ({_CUST_PTS_SQL}),
r2 AS (SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
       count(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_val FROM pts GROUP BY 1),
r1 AS (SELECT {_parent_sql('cell')} AS cell, CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(sum_val) AS BIGINT) AS sum_val FROM r2 GROUP BY 1),
r0 AS (SELECT {_parent_sql('cell')} AS cell, CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(sum_val) AS BIGINT) AS sum_val FROM r1 GROUP BY 1)
SELECT {RASTER_RES} AS res, cell, n, sum_val FROM r2
UNION ALL SELECT {RASTER_RES - 1} AS res, cell, n, sum_val FROM r1
UNION ALL SELECT {RASTER_RES - 2} AS res, cell, n, sum_val FROM r0"""


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster×vector zonal statistics: per-extract aggregates over raster
    cell centers (center-point rule)."""
    from .operators.raster import rasterize, zonal_stats

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    raster = rasterize(pts, RASTER_RES, value_col="cents")
    return zonal_stats(raster, catalog(), RASTER_RES)


_W = grid.cell_width(RASTER_RES)
Q_ZONAL_STATS_SQL = f"""WITH p0 AS ({_CUST_PTS_SQL}),
r AS (SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
        count(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_val FROM p0 GROUP BY 1),
pts AS (SELECT cell, n, sum_val,
        (CAST(cell // {grid.CELL_SHIFT} AS DOUBLE) + 0.5) * {_W!r} - 180.0 AS lon,
        (CAST(cell % {grid.CELL_SHIFT} AS DOUBLE) + 0.5) * {_W!r} - 90.0 AS lat
      FROM r),
m AS ({membership_sql('cell, n, sum_val')})
SELECT extract, count(*) AS n_cells, CAST(SUM(n) AS BIGINT) AS n_points,
  CAST(SUM(sum_val) AS BIGINT) AS sum_val
FROM m GROUP BY extract"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl primitive: per url, did each WARC snapshot change
    against its predecessor? One window (lag of the content hash over
    (url) ordered by ver) — the diff an incremental pipeline uses to skip
    re-processing unchanged pages. ``is_new`` marks a url's first
    snapshot; ``changed`` is false for byte-identical re-crawls.

    Scale shape: one shuffle on url (evenly distributed — it's a key with
    ≤ VERSIONS_PER_URL rows each), hash computed map-side, no join."""
    from pyspark.sql import Window

    from .sources.pages import synth_pages

    pages = synth_pages(spark, sf_dir)
    w = Window.partitionBy("url").orderBy("ver")
    h = F.md5(F.col("text").cast("binary"))
    prev = F.lag(h).over(w)
    return pages.select(
        "url",
        "ver",
        prev.isNull().alias("is_new"),
        F.coalesce(h != prev, F.lit(True)).alias("changed"),
    )


def _snapshot_diff_sql() -> str:
    from .sources.pages import PAGES_SQL

    return f"""WITH pages AS ({PAGES_SQL}),
h AS (SELECT url, ver, md5(text) AS th FROM pages)
SELECT url, CAST(ver AS BIGINT) AS ver,
  (lag(th) OVER (PARTITION BY url ORDER BY ver) IS NULL) AS is_new,
  COALESCE(th <> lag(th) OVER (PARTITION BY url ORDER BY ver), TRUE)
    AS changed
FROM h"""


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key at res 12 (~9 km cells): the write-
    layout optimization — repartitionByRange + sortWithinPartitions on
    this key clusters spatially-near rows into few files so min/max file
    stats prune bbox scans. Pure Catalyst bit arithmetic
    (functions/grid.py:zorder_expr; one mask table drives the Spark expr,
    the SQL twin and the numpy reference)."""
    pts = part_nodes(spark, sf_dir)
    return pts.select(
        "id",
        grid.zorder_expr(F.col("lon"), F.col("lat"), 12).alias("z"),
    )


Q_ZORDER_SQL = (
    f"WITH pts AS ({PTS_SQL}) SELECT id, "
    f"CAST({grid.zorder_sql('lon', 'lat', 12)} AS BIGINT) AS z FROM pts"
)


def q_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert clustering key at res 12 (functions/grid.py:hilbert_expr)
    — the seam-free alternative to the Morton key for write layout:
    consecutive keys are ALWAYS Chebyshev-adjacent cells (property-
    certified in tests/test_hilbert.py), so range-partitioned files map
    to contiguous cell blobs and min/max stats prune harder than
    zorder's block-seamed ranges. Quantization in Catalyst; the 12-round
    curve walk in ONE Arrow-batched numpy kernel (the grid layer's only
    sanctioned UDF drop — the Catalyst unroll measured ~50µs/row against
    the kernel's ~40ns/row)."""
    pts = part_nodes(spark, sf_dir)
    return pts.select(
        "id",
        grid.hilbert_expr(F.col("lon"), F.col("lat"), 12).alias("h"),
    )


Q_HILBERT_SQL = grid.hilbert_sql_query(PTS_SQL, 12)


def q_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedTable READ path under the driver gate (plans/table.py):
    commit ``events`` as three range-clustered append versions with
    per-file min/max stats on ``event_id``, snapshot-read the head with
    ``between=('event_id', lo, hi)`` — the manifest drops every file
    whose [min, max] cannot intersect before Spark opens a footer — and
    roll the survivors up per event_type. lo/hi = the bottom third of
    the id range (one bounded min/max collect, driver-side metadata
    only). Integer-cents sums keep the aggregate order-independent
    exact vs the DuckDB oracle (plain BETWEEN over the raw parquet).

    Scale shape: pruning is manifest-list arithmetic on the driver
    (O(files), no data touched); the remaining scan is a plain parquet
    read with the residual filter pushed down. At 100 TB the same
    layout (range-clustered commits + stats) skips whole commits."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path as _P

    from .plans.table import VersionedTable

    ev = _t(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("event_id"), F.max("event_id")).first()
    key = hashlib.md5(f"{sf_dir}|{mn}|{mx}".encode()).hexdigest()[:12]
    root = _P(tempfile.gettempdir()) / f"osmhs_table_read_{key}"
    marker = root / "_built"
    if not marker.exists():
        shutil.rmtree(root, ignore_errors=True)
        tbl = VersionedTable(spark, str(root))
        for b in range(3):
            chunk = ev.filter(
                (F.col("event_id") % 3) == b
            ).repartitionByRange(2, "event_id")
            tbl.commit(chunk, mode="append", stats_cols=["event_id"])
        marker.touch()
    tbl = VersionedTable(spark, str(root))
    lo, hi = mn, mn + (mx - mn) // 3
    snap = tbl.read(between=("event_id", lo, hi))
    return snap.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


Q_TABLE_READ_SQL = """WITH b AS (
  SELECT MIN(event_id) AS lo,
         MIN(event_id) + (MAX(event_id) - MIN(event_id)) // 3 AS hi
  FROM events)
SELECT event_type, count(*) AS n,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events, b WHERE event_id BETWEEN b.lo AND b.hi
GROUP BY event_type"""


def q_polygonize_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector polygonization, relational half (operators/raster.py:
    region_labels + boundary_edges): rasterize customer points, class each
    cell by clamped count, label 4-adjacent same-class regions via
    distributed connected components, and emit every region's directed
    boundary segments in integer corner coordinates. The sequential ring
    stitching on top of these edges is pytest-certified separately
    (tests/test_polygonize.py — PIP roundtrip); the edge set is the
    SQL-expressible contract the oracle can pin exactly."""
    from .operators.raster import boundary_edges, rasterize

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        (((k * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((k * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )
    classed = rasterize(pts, RASTER_RES).select(
        "cell", F.least(F.col("n"), F.lit(3)).cast("int").alias("cls")
    )
    return boundary_edges(classed, "cls")


_S = grid.CELL_SHIFT
Q_POLYGONIZE_EDGES_SQL = f"""WITH RECURSIVE pts AS ({_CUST_PTS_SQL}),
r AS (SELECT {grid.cell_id_sql('lon', 'lat', RASTER_RES)} AS cell,
      count(*) AS n FROM pts GROUP BY 1),
c AS (SELECT cell, CAST(least(n, 3) AS INT) AS cls FROM r),
e AS (SELECT a.cell AS ca, b.cell AS cb FROM c a JOIN c b
      ON (b.cell = a.cell + {_S} OR b.cell = a.cell + 1) AND b.cls = a.cls),
ud AS (SELECT ca, cb FROM e UNION SELECT cb AS ca, ca AS cb FROM e),
reach(cell, rlbl) AS (
  SELECT cell, cell FROM c
  UNION
  SELECT ud.ca, reach.rlbl FROM ud JOIN reach ON reach.cell = ud.cb),
lbl AS (SELECT cell, min(rlbl) AS region FROM reach GROUP BY cell),
sides(delta, sx0, sy0, sx1, sy1) AS (VALUES
  (-1, 0, 0, 1, 0), ({_S}, 1, 0, 1, 1), (1, 1, 1, 0, 1), (-{_S}, 0, 1, 0, 0)),
b AS (
  SELECT l.region, c.cls,
         (c.cell // {_S}) + s.sx0 AS x0, (c.cell % {_S}) + s.sy0 AS y0,
         (c.cell // {_S}) + s.sx1 AS x1, (c.cell % {_S}) + s.sy1 AS y1
  FROM c JOIN lbl l USING (cell) CROSS JOIN sides s
  WHERE NOT EXISTS (SELECT 1 FROM c nb
                    WHERE nb.cell = c.cell + s.delta AND nb.cls = c.cls))
SELECT region, cls, CAST(x0 AS BIGINT) AS x0, CAST(y0 AS BIGINT) AS y0,
       CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1 FROM b"""


#: ε-join / DBSCAN point cloud: orders → integer centidegree lattice,
#: SHIFTED NON-NEGATIVE (xs ∈ [0, 36000), ys ∈ [0, 18000)) so floor
#: division is truncation in every engine. Integer end-to-end — the
#: oracle hash never sees a float.
NEIGHBOR_RADIUS = 300  # centidegrees (3°): the synthesis lattice's min
# pairwise distance is ~221, so 300 yields ~557 pairs at sf0.001 (smaller
# radii are vacuous — lattice points anti-cluster, unlike a Poisson cloud)
DBSCAN_EPS = 1200  # 12° cells → multi-cell dense components at sf0.001
DBSCAN_MIN_PTS = 3


def _order_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        k.alias("id"),
        ((k * 7919) % 36000).cast("long").alias("xs"),
        ((k * 104729) % 18000).cast("long").alias("ys"),
    )


_ORDER_PTS_SQL = (
    "SELECT o_orderkey AS id, (o_orderkey*7919)%36000 AS xs, "
    "(o_orderkey*104729)%18000 AS ys FROM orders"
)


def q_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-bounded spatial self-join (operators/neighbors.py:
    within_distance_pairs): all point pairs within 3° planar — the
    ε-join under POI conflation and near-duplicate geotag detection.
    Grid-bucketed cell equi-join (×9 one-sided replication), exactly-once
    pair emission via the home-cell/id-order predicate — NO CartesianProduct
    and NO post-join distinct (plan-asserted in tests/test_neighbors.py)."""
    from .operators.neighbors import within_distance_pairs

    return within_distance_pairs(_order_pts(spark, sf_dir), NEIGHBOR_RADIUS)


Q_NEIGHBOR_PAIRS_SQL = f"""WITH pts AS ({_ORDER_PTS_SQL}),
cells AS (SELECT id, xs, ys,
  (xs // {NEIGHBOR_RADIUS}) * 4294967296 + (ys // {NEIGHBOR_RADIUS}) AS cell
  FROM pts),
deltas(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                          (1,-1),(1,0),(1,1)),
rep AS (SELECT id, xs, ys, cell + dx * 4294967296 + dy AS cell
        FROM cells CROSS JOIN deltas)
SELECT a.id AS id_a, b.id AS id_b,
  CAST((a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys) AS BIGINT) AS dist2
FROM cells a JOIN rep b USING (cell)
WHERE a.id < b.id
  AND (a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys)
      <= {NEIGHBOR_RADIUS * NEIGHBOR_RADIUS}"""


#: Ripley-K radius ladder over the same order lattice: the smallest rung
#: sits just above the lattice's ~221-centidegree min pair distance so
#: every rung is non-vacuous at sf0.001, and the ladder spans the
#: clustered→saturated transition the statistic exists to resolve.
RIPLEY_RADII = (250, 300, 450, 600)


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K-function pair-count ladder (operators/neighbors.py:
    ripley_k_counts): for each radius rung, the exact number of unordered
    point pairs within that distance — the point-pattern clustering
    statistic (K̂(r) vs the Poisson πr² expectation) over geotagged
    documents. ONE grid-bucketed ε-join at max(r) feeds every rung
    (map-side rung fan-out, combinable 4-row groupBy); integer-exact
    (squared distances), so the driver hash is bit-stable."""
    from .operators.neighbors import ripley_k_counts

    return ripley_k_counts(_order_pts(spark, sf_dir), RIPLEY_RADII)


_RK_MAX = max(RIPLEY_RADII)
Q_RIPLEY_K_SQL = f"""WITH pts AS ({_ORDER_PTS_SQL}),
cells AS (SELECT id, xs, ys,
  (xs // {_RK_MAX}) * 4294967296 + (ys // {_RK_MAX}) AS cell FROM pts),
deltas(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                          (1,-1),(1,0),(1,1)),
rep AS (SELECT id, xs, ys, cell + dx * 4294967296 + dy AS cell
        FROM cells CROSS JOIN deltas),
pairs AS (
  SELECT (a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys) AS dist2
  FROM cells a JOIN rep b USING (cell)
  WHERE a.id < b.id
    AND (a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys)
        <= {_RK_MAX * _RK_MAX}),
radii(radius) AS (VALUES {", ".join(f"({r})" for r in RIPLEY_RADII)})
SELECT CAST(radius AS BIGINT) AS radius,
  CAST((SELECT count(*) FROM pairs p WHERE p.dist2 <= radius*radius)
       AS BIGINT) AS pair_count,
  CAST((SELECT count(*) FROM pts) AS BIGINT) AS n_points
FROM radii"""


#: variogram lag-bin ladder (shares the Ripley rungs so the two
#: statistics describe the same scales)
VARIOGRAM_RADII = RIPLEY_RADII

#: spatially-structured integer field over the order points: value =
#: xs % 97 + ys % 89 — nearby points share residues more often than far
#: ones, so γ̂ actually grows with lag (a live, non-noise variogram)
_VGM_VAL = "(xs % 97 + ys % 89)"


def q_variogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical variogram (operators/neighbors.py:variogram_bins): per
    half-open lag bin, the unordered pair count and Σ(v_i − v_j)² of an
    integer field over the geotagged order points — the kriging
    calibration statistic. ONE grid ε-join at max(lag) feeds every bin
    (CASE ladder, no per-rung fan-out), values ride the join — no
    back-join by id; integer-exact state, γ̂ = ss/(2n) left to the
    consumer (the HLL convention)."""
    from .operators.neighbors import variogram_bins

    pts = _order_pts(spark, sf_dir).withColumn(
        "val", F.col("xs") % 97 + F.col("ys") % 89
    )
    return variogram_bins(pts, VARIOGRAM_RADII)


_VG_MAX = max(VARIOGRAM_RADII)
_VG_CASE = " ".join(
    f"WHEN dist2 <= {r * r} THEN {r}" for r in VARIOGRAM_RADII
)
Q_VARIOGRAM_SQL = f"""WITH pts0 AS ({_ORDER_PTS_SQL}),
pts AS (SELECT id, xs, ys, {_VGM_VAL} AS val FROM pts0),
cells AS (SELECT id, xs, ys, val,
  (xs // {_VG_MAX}) * 4294967296 + (ys // {_VG_MAX}) AS cell FROM pts),
deltas(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                          (1,-1),(1,0),(1,1)),
rep AS (SELECT id, xs, ys, val, cell + dx * 4294967296 + dy AS cell
        FROM cells CROSS JOIN deltas),
pairs AS (
  SELECT (a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys) AS dist2,
         (a.val-b.val)*(a.val-b.val) AS sq
  FROM cells a JOIN rep b USING (cell)
  WHERE a.id < b.id
    AND (a.xs-b.xs)*(a.xs-b.xs) + (a.ys-b.ys)*(a.ys-b.ys)
        <= {_VG_MAX * _VG_MAX}),
binned AS (
  SELECT CASE {_VG_CASE} END AS radius, count(*) AS np, sum(sq) AS ss
  FROM pairs GROUP BY 1),
radii(radius) AS (VALUES {", ".join(f"({r})" for r in VARIOGRAM_RADII)})
SELECT CAST(radii.radius AS BIGINT) AS radius,
  CAST(coalesce(np, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(ss, 0) AS BIGINT) AS sum_sq_diff
FROM radii LEFT JOIN binned ON radii.radius = binned.radius"""


#: Rectangle-overlap join fixtures: orders → small extents (way bboxes),
#: customers → larger extents (region-of-interest boxes). Same shifted
#: non-negative centidegree domain as the point lattice; widths bounded
#: so x1 < 36000, y1 < 18000 — integer end-to-end.
RECT_CELL = 600  # grid edge near the median A-rect edge


def _order_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    x0 = (k * 7919) % 35000
    y0 = (k * 104729) % 17000
    return _t(spark, sf_dir, "orders").select(
        k.alias("id"),
        x0.cast("long").alias("x0"),
        y0.cast("long").alias("y0"),
        (x0 + (k * 271) % 900 + 1).cast("long").alias("x1"),
        (y0 + (k * 577) % 700 + 1).cast("long").alias("y1"),
    )


def _cust_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("c_custkey")
    x0 = (k * 6553) % 33000
    y0 = (k * 39119) % 15000
    return _t(spark, sf_dir, "customer").select(
        k.alias("id"),
        x0.cast("long").alias("x0"),
        y0.cast("long").alias("y0"),
        (x0 + (k * 433) % 2500 + 100).cast("long").alias("x1"),
        (y0 + (k * 769) % 2200 + 100).cast("long").alias("y1"),
    )


_ORDER_RECTS_SQL = (
    "SELECT o_orderkey AS id, (o_orderkey*7919)%35000 AS x0, "
    "(o_orderkey*104729)%17000 AS y0, "
    "(o_orderkey*7919)%35000 + (o_orderkey*271)%900 + 1 AS x1, "
    "(o_orderkey*104729)%17000 + (o_orderkey*577)%700 + 1 AS y1 "
    "FROM orders"
)
_CUST_RECTS_SQL = (
    "SELECT c_custkey AS id, (c_custkey*6553)%33000 AS x0, "
    "(c_custkey*39119)%15000 AS y0, "
    "(c_custkey*6553)%33000 + (c_custkey*433)%2500 + 100 AS x1, "
    "(c_custkey*39119)%15000 + (c_custkey*769)%2200 + 100 AS y1 "
    "FROM customer"
)


def q_rect_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-extent overlap join (operators/extents.py:
    rect_overlap_join): order extents × customer extents, one row per
    closed-intersecting pair with the intersection box and its area —
    the R-tree-join / overlay-filter primitive, as a grid-bucketed hash
    equi-join with canonical-cell exactly-once emission (no
    CartesianProduct, no distinct; plan-asserted in
    tests/test_extents.py). Integer-exact output columns."""
    from .operators.extents import rect_overlap_join

    return rect_overlap_join(
        _order_rects(spark, sf_dir), _cust_rects(spark, sf_dir), RECT_CELL
    )


Q_RECT_OVERLAP_SQL = f"""WITH ra AS ({_ORDER_RECTS_SQL}),
rb AS ({_CUST_RECTS_SQL})
SELECT a.id AS id_a, b.id AS id_b,
  CAST(greatest(a.x0, b.x0) AS BIGINT) AS ix0,
  CAST(greatest(a.y0, b.y0) AS BIGINT) AS iy0,
  CAST(least(a.x1, b.x1) AS BIGINT) AS ix1,
  CAST(least(a.y1, b.y1) AS BIGINT) AS iy1,
  CAST((least(a.x1, b.x1) - greatest(a.x0, b.x0))
     * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS BIGINT) AS inter_area
FROM ra a JOIN rb b
  ON a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1"""


def q_spatial_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN density clustering (operators/neighbors.py:
    grid_dbscan_cells): dense ε-cells (≥3 points) 8-connected into
    components; every point in a dense cell gets its component's cluster
    id (min dense-cell id — deterministic). Sparse-cell points are noise
    and dropped. The component loop runs on the dense-CELL graph (already
    aggregated, ≪ point count) via the dedup layer's min-label
    propagation + pointer jumping."""
    from .operators.neighbors import grid_dbscan_cells

    return grid_dbscan_cells(
        _order_pts(spark, sf_dir), DBSCAN_EPS, DBSCAN_MIN_PTS
    )


Q_SPATIAL_CLUSTERS_SQL = f"""WITH RECURSIVE pts AS ({_ORDER_PTS_SQL}),
cells AS (SELECT id,
  (xs // {DBSCAN_EPS}) * 4294967296 + (ys // {DBSCAN_EPS}) AS cell FROM pts),
dense AS (SELECT cell FROM cells GROUP BY cell
          HAVING count(*) >= {DBSCAN_MIN_PTS}),
deltas(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                          (1,-1),(1,0),(1,1)),
e AS (SELECT d.cell AS src, d.cell + dx * 4294967296 + dy AS dst
      FROM dense d CROSS JOIN deltas),
edges AS (SELECT src, dst FROM e WHERE dst IN (SELECT cell FROM dense)),
reach(cell, rlbl) AS (
  SELECT cell, cell FROM dense
  UNION
  SELECT edges.src, reach.rlbl FROM edges JOIN reach ON reach.cell = edges.dst),
lbl AS (SELECT cell, min(rlbl) AS cluster FROM reach GROUP BY cell)
SELECT c.id, c.cell, l.cluster
FROM cells c JOIN lbl l USING (cell)"""


KNN_JOIN_K = 3
KNN_JOIN_R0 = 200  # first-round radius; sparse lefts escalate ×2 per round

_CUST_PTS_INT_SQL = (
    "SELECT c_custkey AS id, (c_custkey*12553)%36000 AS xs, "
    "(c_custkey*30011)%18000 AS ys FROM customer"
)


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join (operators/neighbors.py:knn_join): each order point's 3
    nearest customer points via iterative radius doubling over the ε-join
    — dense lefts resolve at the cheap first radius, sparse stragglers
    escalate; no CartesianProduct at any round. The DuckDB twin is the
    brute-force window over the full cross product — exact at oracle
    scale, which is precisely what the distributed path must reproduce."""
    from .operators.neighbors import knn_join

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    right = c.select(
        k.alias("id"),
        ((k * 12553) % 36000).cast("long").alias("xs"),
        ((k * 30011) % 18000).cast("long").alias("ys"),
    )
    return knn_join(
        _order_pts(spark, sf_dir), right, KNN_JOIN_K, KNN_JOIN_R0
    )


Q_KNN_JOIN_SQL = f"""WITH l AS ({_ORDER_PTS_SQL}),
r AS ({_CUST_PTS_INT_SQL}),
d AS (SELECT l.id AS id_l, r.id AS id_r,
        (l.xs-r.xs)*(l.xs-r.xs) + (l.ys-r.ys)*(l.ys-r.ys) AS dist2
      FROM l CROSS JOIN r),
w AS (SELECT id_l, id_r, CAST(dist2 AS BIGINT) AS dist2,
        row_number() OVER (PARTITION BY id_l ORDER BY dist2, id_r) AS rk
      FROM d)
SELECT id_l, id_r, dist2, CAST(rk AS INT) AS rk FROM w
WHERE rk <= {KNN_JOIN_K}"""


#: integer node coordinates for the shoelace stats (same shifted
#: centidegree convention as the ε-join cloud, keyed by partkey so the
#: order_ways refs resolve)
_PART_PTS_INT_SQL = (
    "SELECT p_partkey AS id, (p_partkey*7919)%36000 AS xs, "
    "(p_partkey*104729)%18000 AS ys FROM part"
)


def q_way_ring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-way shoelace statistics (operators/polygon_stats.py:
    way_ring_stats): twice-signed-area and centroid numerators of every
    order-way's implicit ring, integer-exact end to end. One ref-coord
    equi-join, one per-way window to close the ring, one groupBy — the
    per-feature geometry aggregate the reference never computes
    (its ways never leave id-list form, softcut.hpp:179-212)."""
    from .operators.polygon_stats import way_ring_stats

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    nodes = p.select(
        k.alias("id"),
        ((k * 7919) % 36000).cast("long").alias("xs"),
        ((k * 104729) % 18000).cast("long").alias("ys"),
    )
    ways = order_ways(spark, sf_dir).select("id", "refs")
    return way_ring_stats(ways, nodes)


Q_WAY_RING_STATS_SQL = f"""WITH pts AS ({_PART_PTS_INT_SQL}),
e AS (SELECT l_orderkey AS id,
        row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey) AS pos,
        l_partkey AS ref
      FROM lineitem),
v AS (SELECT e.id, e.pos, p.xs AS x, p.ys AS y
      FROM e JOIN pts p ON p.id = e.ref),
c AS (SELECT id, x, y,
        coalesce(lead(x) OVER w, first_value(x) OVER wf) AS xn,
        coalesce(lead(y) OVER w, first_value(y) OVER wf) AS yn
      FROM v
      WINDOW w AS (PARTITION BY id ORDER BY pos),
             wf AS (PARTITION BY id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING))
SELECT id, CAST(count(*) AS BIGINT) AS nvert,
       CAST(sum(x*yn - xn*y) AS BIGINT) AS area2,
       CAST(sum((x + xn) * (x*yn - xn*y)) AS BIGINT) AS cx_num,
       CAST(sum((y + yn) * (x*yn - xn*y)) AS BIGINT) AS cy_num
FROM c GROUP BY id"""


#: segment-join synthesis: short segments (|Δ| ≤ 500 < cell 512) around
#: the lattice centers, endpoints clamped into the non-negative domain —
#: realistic road-segment scale, so the grid replication stays 1-4 cells
SEGJOIN_CELL = 512

_ORDER_SEGS_SQL = (
    "SELECT o_orderkey AS id, (o_orderkey*7919)%36000 AS x1, "
    "(o_orderkey*104729)%18000 AS y1, "
    "greatest(0, least(35999, (o_orderkey*7919)%36000 "
    "+ (o_orderkey*31)%1001 - 500)) AS x2, "
    "greatest(0, least(17999, (o_orderkey*104729)%18000 "
    "+ (o_orderkey*57)%1001 - 500)) AS y2 FROM orders"
)

_CUST_SEGS_SQL = (
    "SELECT c_custkey AS id, (c_custkey*12553)%36000 AS x1, "
    "(c_custkey*30011)%18000 AS y1, "
    "greatest(0, least(35999, (c_custkey*12553)%36000 "
    "+ (c_custkey*43)%1001 - 500)) AS x2, "
    "greatest(0, least(17999, (c_custkey*30011)%18000 "
    "+ (c_custkey*71)%1001 - 500)) AS y2 FROM customer"
)


def _segs(df: DataFrame, key: str, m1: int, m2: int, d1: int, d2: int):
    k = F.col(key)
    x1 = ((k * m1) % 36000).cast("long")
    y1 = ((k * m2) % 18000).cast("long")
    return df.select(
        k.cast("long").alias("id"),
        x1.alias("x1"),
        y1.alias("y1"),
        F.greatest(
            F.lit(0), F.least(F.lit(35999), x1 + (k * d1) % 1001 - 500)
        ).cast("long").alias("x2"),
        F.greatest(
            F.lit(0), F.least(F.lit(17999), y1 + (k * d2) % 1001 - 500)
        ).cast("long").alias("y2"),
    )


def q_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-intersection join (operators/segjoin.py): order segments ×
    customer segments sharing at least one point — bbox-grid candidate
    generation (map-side sequence explode), ONE cell equi-join,
    exactly-once emission from the canonical cell (lower-left corner of
    the bbox intersection), integer orientation refine. The DuckDB twin
    is the brute cross join with the identical integer predicate — exact
    at oracle scale, no CartesianProduct in the Spark plan."""
    from .operators.segjoin import segment_intersections

    a = _segs(_t(spark, sf_dir, "orders"), "o_orderkey", 7919, 104729, 31, 57)
    b = _segs(_t(spark, sf_dir, "customer"), "c_custkey", 12553, 30011, 43, 71)
    return segment_intersections(a, b, SEGJOIN_CELL)


# NOTE: the bbox bounds are PRECOMPUTED columns in the a/b CTEs — a
# least()/greatest() expression placed directly in the cross-join filter
# trips a DuckDB internal error ("requires a flat vector") in its
# range-join planner.
Q_SEGMENT_JOIN_SQL = f"""WITH a0 AS ({_ORDER_SEGS_SQL}),
b0 AS ({_CUST_SEGS_SQL}),
a AS (SELECT *, least(x1, x2) AS lox, greatest(x1, x2) AS hix,
             least(y1, y2) AS loy, greatest(y1, y2) AS hiy FROM a0),
b AS (SELECT *, least(x1, x2) AS lox, greatest(x1, x2) AS hix,
             least(y1, y2) AS loy, greatest(y1, y2) AS hiy FROM b0),
d AS (SELECT a.id AS id_a, b.id AS id_b,
        a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
        b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2,
        a.lox AS alox, a.hix AS ahix, a.loy AS aloy, a.hiy AS ahiy,
        b.lox AS blox, b.hix AS bhix, b.loy AS bloy, b.hiy AS bhiy
      FROM a CROSS JOIN b
      WHERE a.lox <= b.hix AND b.lox <= a.hix
        AND a.loy <= b.hiy AND b.loy <= a.hiy),
o AS (SELECT *,
        (bx2-bx1)*(ay1-by1) - (by2-by1)*(ax1-bx1) AS d1,
        (bx2-bx1)*(ay2-by1) - (by2-by1)*(ax2-bx1) AS d2,
        (ax2-ax1)*(by1-ay1) - (ay2-ay1)*(bx1-ax1) AS d3,
        (ax2-ax1)*(by2-ay1) - (ay2-ay1)*(bx2-ax1) AS d4
      FROM d)
SELECT id_a, id_b FROM o
WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
      AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
   OR d1 = 0 AND ax1 BETWEEN blox AND bhix AND ay1 BETWEEN bloy AND bhiy
   OR d2 = 0 AND ax2 BETWEEN blox AND bhix AND ay2 BETWEEN bloy AND bhiy
   OR d3 = 0 AND bx1 BETWEEN alox AND ahix AND by1 BETWEEN aloy AND ahiy
   OR d4 = 0 AND bx2 BETWEEN alox AND ahix AND by2 BETWEEN aloy AND ahiy"""


#: ring-validity grid edge — way-ring segments are lattice-scale (median
#: ~9000 centidegrees, vs the ~500 of the synthetic road segments), so
#: the cell follows them up: ≤ ~17 replicas per max-diagonal edge
RING_CELL = 8192


def q_ring_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring validity (operators/segjoin.py:ring_self_intersections):
    does each order-way's implicit closed ring self-intersect? The OGC
    simplicity test the reference never runs on its ``.poly`` shells
    (``geometryreader.hpp`` trusts the file) — run corpus-wide as a
    grid-partitioned join with ``gid`` in the join key, so candidates
    stay ring-local and each non-adjacent edge pair is tested exactly
    once (canonical-cell rule). The twin is the per-ring brute pair join
    with the identical CLRS integer-orientation arithmetic."""
    from pyspark.sql import Window

    from .operators.segjoin import ring_self_intersections

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    pts = p.select(
        k.alias("ref"),
        ((k * 7919) % 36000).cast("long").alias("x"),
        ((k * 104729) % 18000).cast("long").alias("y"),
    )
    ways = order_ways(spark, sf_dir).select(
        "id", F.posexplode("refs").alias("pos", "ref")
    )
    v = ways.join(pts, "ref").select("id", "pos", "x", "y")
    w = Window.partitionBy("id").orderBy("pos")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    segs = v.select(
        F.col("id").alias("gid"),
        F.col("pos").cast("long").alias("seq"),
        F.count(F.lit(1)).over(wf).cast("long").alias("nseg"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        F.coalesce(F.lead("x").over(w), F.first("x").over(wf)).alias("x2"),
        F.coalesce(F.lead("y").over(w), F.first("y").over(wf)).alias("y2"),
    )
    bad = (
        ring_self_intersections(segs, RING_CELL)
        .groupBy(F.col("gid").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    allw = segs.groupBy(F.col("gid").alias("id")).agg(
        F.max("nseg").cast("long").alias("nseg")
    )
    return allw.join(bad, "id", "left").select(
        "id",
        "nseg",
        F.coalesce("n_bad", F.lit(0)).cast("long").alias("n_self_x"),
        (F.coalesce("n_bad", F.lit(0)) == 0).alias("is_simple"),
    )


Q_RING_SIMPLE_SQL = f"""WITH pts AS ({_PART_PTS_INT_SQL}),
e AS (SELECT l_orderkey AS id,
        row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey) - 1 AS pos,
        l_partkey AS ref
      FROM lineitem),
v AS (SELECT e.id, e.pos, p.xs AS x, p.ys AS y
      FROM e JOIN pts p ON p.id = e.ref),
s AS (SELECT id, pos AS seq,
        count(*) OVER (PARTITION BY id) AS nseg,
        x AS x1, y AS y1,
        coalesce(lead(x) OVER w, first_value(x) OVER wf) AS x2,
        coalesce(lead(y) OVER w, first_value(y) OVER wf) AS y2
      FROM v
      WINDOW w AS (PARTITION BY id ORDER BY pos),
             wf AS (PARTITION BY id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)),
pairs AS (
  SELECT a.id,
         a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
         b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2,
         least(a.x1, a.x2) AS alox, greatest(a.x1, a.x2) AS ahix,
         least(a.y1, a.y2) AS aloy, greatest(a.y1, a.y2) AS ahiy,
         least(b.x1, b.x2) AS blox, greatest(b.x1, b.x2) AS bhix,
         least(b.y1, b.y2) AS bloy, greatest(b.y1, b.y2) AS bhiy
  FROM s a JOIN s b ON a.id = b.id AND b.seq > a.seq + 1
    AND NOT (a.seq = 0 AND b.seq = a.nseg - 1)),
o AS (SELECT *,
        (bx2-bx1)*(ay1-by1) - (by2-by1)*(ax1-bx1) AS d1,
        (bx2-bx1)*(ay2-by1) - (by2-by1)*(ax2-bx1) AS d2,
        (ax2-ax1)*(by1-ay1) - (ay2-ay1)*(bx1-ax1) AS d3,
        (ax2-ax1)*(by2-ay1) - (ay2-ay1)*(bx2-ax1) AS d4
      FROM pairs),
hits AS (
  SELECT id, count(*) AS n_bad FROM o
  WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
        AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
     OR d1 = 0 AND ax1 BETWEEN blox AND bhix AND ay1 BETWEEN bloy AND bhiy
     OR d2 = 0 AND ax2 BETWEEN blox AND bhix AND ay2 BETWEEN bloy AND bhiy
     OR d3 = 0 AND bx1 BETWEEN alox AND ahix AND by1 BETWEEN aloy AND ahiy
     OR d4 = 0 AND bx2 BETWEEN alox AND ahix AND by2 BETWEEN aloy AND ahiy
  GROUP BY 1),
w2 AS (SELECT id, CAST(max(nseg) AS BIGINT) AS nseg FROM s GROUP BY 1)
SELECT w2.id, w2.nseg,
       CAST(coalesce(h.n_bad, 0) AS BIGINT) AS n_self_x,
       (coalesce(h.n_bad, 0) = 0) AS is_simple
FROM w2 LEFT JOIN hits h ON h.id = w2.id"""


#: inclusive point-to-segment join radius (centidegree units)
PTSEG_EPS = 50


def q_point_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-to-segment ε-join (operators/ptseg.py): part points within
    PTSEG_EPS of an order segment — segments replicate map-side to the
    cells of their ε-expanded bbox, points keep their single home cell,
    ONE hash equi-join on the cell key gives every pair exactly once,
    and the three-case point-segment distance refine is pure integer
    cross-multiplication (endpoint cases ``|AP|² ≤ ε²``, interior case
    ``cross² ≤ ε²·|AB|²``). The DuckDB twin is the brute cross join with
    the identical integer predicate behind an expanded-bbox prefilter —
    exact at oracle scale, no CartesianProduct in the Spark plan."""
    from .operators.ptseg import points_near_segments

    k = F.col("p_partkey")
    pts = _t(spark, sf_dir, "part").select(
        k.cast("long").alias("id"),
        ((k * 7919) % 36000).cast("long").alias("x"),
        ((k * 104729) % 18000).cast("long").alias("y"),
    )
    segs = _segs(_t(spark, sf_dir, "orders"), "o_orderkey", 7919, 104729, 31, 57)
    return points_near_segments(pts, segs, PTSEG_EPS, SEGJOIN_CELL)


# same flat-vector workaround as Q_SEGMENT_JOIN_SQL: the expanded bbox
# bounds are PRECOMPUTED columns, not expressions in the join filter.
Q_POINT_SEGMENT_SQL = f"""WITH p AS (
  SELECT p_partkey AS id_p,
    CAST((p_partkey*7919)%36000 AS BIGINT) AS px,
    CAST((p_partkey*104729)%18000 AS BIGINT) AS py
  FROM part),
s0 AS ({_ORDER_SEGS_SQL}),
s AS (SELECT id AS id_s, x1, y1, x2, y2,
        least(x1, x2) - {PTSEG_EPS} AS lox,
        greatest(x1, x2) + {PTSEG_EPS} AS hix,
        least(y1, y2) - {PTSEG_EPS} AS loy,
        greatest(y1, y2) + {PTSEG_EPS} AS hiy FROM s0),
d AS (SELECT id_p, id_s, px, py, x1, y1, x2, y2,
        (px-x1)*(x2-x1) + (py-y1)*(y2-y1) AS dot,
        (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) AS l2,
        (x2-x1)*(py-y1) - (y2-y1)*(px-x1) AS crs
      FROM p CROSS JOIN s
      WHERE px BETWEEN lox AND hix AND py BETWEEN loy AND hiy)
SELECT id_p, id_s FROM d
WHERE CASE
  WHEN dot <= 0 THEN (px-x1)*(px-x1) + (py-y1)*(py-y1)
                     <= {PTSEG_EPS * PTSEG_EPS}
  WHEN dot >= l2 THEN (px-x2)*(px-x2) + (py-y2)*(py-y2)
                      <= {PTSEG_EPS * PTSEG_EPS}
  ELSE crs*crs <= {PTSEG_EPS * PTSEG_EPS} * l2 END"""


def q_snap_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-segment snap (operators/ptseg.py:snap_to_segments): every
    part point's nearest order segment, by iterative radius doubling
    over the cell-join candidates — dense points resolve at the cheap
    radius, only stragglers escalate. The argmin is EXACT: squared
    distance stays the rational num/den and 'b beats a' is a
    decimal(38,0) cross-multiplication, so ties break identically on
    every engine (segment id ascending) and the emitted fraction hashes
    bit-equal. The DuckDB twin is the brute cross join + NOT EXISTS
    with the identical arithmetic in HUGEINT."""
    from .operators.ptseg import snap_to_segments

    k = F.col("p_partkey")
    pts = _t(spark, sf_dir, "part").select(
        k.cast("long").alias("id"),
        ((k * 7919) % 36000).cast("long").alias("x"),
        ((k * 104729) % 18000).cast("long").alias("y"),
    )
    segs = _segs(_t(spark, sf_dir, "orders"), "o_orderkey", 7919, 104729, 31, 57)
    # small initial radius: at bench density most points resolve in
    # round 1 over ~15× fewer candidates than a safe-for-sparse radius
    # would generate; sparse SFs just escalate a few cheap rounds
    return snap_to_segments(pts, segs, init_radius=64)


Q_SNAP_SEGMENT_SQL = f"""WITH p AS (
  SELECT p_partkey AS id_p,
    CAST((p_partkey*7919)%36000 AS BIGINT) AS px,
    CAST((p_partkey*104729)%18000 AS BIGINT) AS py
  FROM part),
s0 AS ({_ORDER_SEGS_SQL}),
d AS (SELECT id_p, id AS id_s, px, py, x1, y1, x2, y2,
        (px-x1)*(x2-x1) + (py-y1)*(y2-y1) AS dot,
        (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) AS l2,
        (x2-x1)*(py-y1) - (y2-y1)*(px-x1) AS crs
      FROM p CROSS JOIN s0),
c AS (SELECT id_p, id_s,
        CAST(CASE
          WHEN dot <= 0 THEN (px-x1)*(px-x1) + (py-y1)*(py-y1)
          WHEN dot >= l2 THEN (px-x2)*(px-x2) + (py-y2)*(py-y2)
          ELSE crs*crs END AS BIGINT) AS num,
        CAST(CASE WHEN dot <= 0 OR dot >= l2 THEN 1 ELSE l2 END
             AS BIGINT) AS den
      FROM d)
SELECT c1.id_p, c1.id_s, c1.num AS d2_num, c1.den AS d2_den
FROM c c1
WHERE NOT EXISTS (
  SELECT 1 FROM c c2
  WHERE c2.id_p = c1.id_p AND (
    CAST(c2.num AS HUGEINT) * c1.den < CAST(c1.num AS HUGEINT) * c2.den
    OR (CAST(c2.num AS HUGEINT) * c1.den
        = CAST(c1.num AS HUGEINT) * c2.den
        AND c2.id_s < c1.id_s)))"""


SPATIAL_QUERIES = {
    "table_read": (q_table_read, Q_TABLE_READ_SQL),
    "point_segment": (q_point_segment, Q_POINT_SEGMENT_SQL),
    "snap_segment": (q_snap_segment, Q_SNAP_SEGMENT_SQL),
    "neighbor_pairs": (q_neighbor_pairs, Q_NEIGHBOR_PAIRS_SQL),
    "ripley_k": (q_ripley_k, Q_RIPLEY_K_SQL),
    "variogram": (q_variogram, Q_VARIOGRAM_SQL),
    "rect_overlap": (q_rect_overlap, Q_RECT_OVERLAP_SQL),
    "mk_trend": (q_mk_trend, _mk_trend_sql()),
    "dwell_segments": (q_dwell_segments, _dwell_segments_sql()),
    "colocation": (q_colocation, _colocation_sql()),
    "hausdorff_pairs": (q_hausdorff_pairs, Q_HAUSDORFF_SQL),
    "trajectory_stats": (q_trajectory_stats, Q_TRAJECTORY_STATS_SQL),
    "spatial_clusters": (q_spatial_clusters, Q_SPATIAL_CLUSTERS_SQL),
    "knn_join": (q_knn_join, Q_KNN_JOIN_SQL),
    "way_ring_stats": (q_way_ring_stats, Q_WAY_RING_STATS_SQL),
    "segment_join": (q_segment_join, Q_SEGMENT_JOIN_SQL),
    "ring_simple": (q_ring_simple, Q_RING_SIMPLE_SQL),
    "polygonize_edges": (q_polygonize_edges, Q_POLYGONIZE_EDGES_SQL),
    "node_membership": (q_node_membership, Q_NODE_MEMBERSHIP_SQL),
    "rasterize": (q_rasterize, Q_RASTERIZE_SQL),
    "zonal_stats": (q_zonal_stats, Q_ZONAL_STATS_SQL),
    "tile_pyramid": (q_tile_pyramid, Q_TILE_PYRAMID_SQL),
    "cell_assign": (q_cell_assign, Q_CELL_ASSIGN_SQL),
    "geohash_assign": (q_geohash_assign, Q_GEOHASH_ASSIGN_SQL),
    "raster_morphology": (q_raster_morphology, Q_RASTER_MORPHOLOGY_SQL),
    "raster_gradient": (q_raster_gradient, _raster_gradient_sql()),
    "hexbin_assign": (q_hexbin_assign, _hexbin_sql()),
    "hotspot_cells": (q_hotspot_cells, Q_HOTSPOT_CELLS_SQL),
    "od_matrix": (q_od_matrix, Q_OD_MATRIX_SQL),
    "morans_i": (q_morans_i, Q_MORANS_I_SQL),
    "getis_hotspots": (q_getis_hotspots, Q_GETIS_HOTSPOTS_SQL),
    "region_label": (q_region_label, Q_REGION_LABEL_SQL),
    "raster_blur": (q_raster_blur, Q_RASTER_BLUR_SQL),
    "kde_heatmap": (q_kde_heatmap, _kde_heatmap_sql()),
    "idw_interpolate": (q_idw_interpolate, Q_IDW_INTERPOLATE_SQL),
    "tile_xyz": (q_tile_xyz, Q_TILE_XYZ_SQL),
    "way_members": (q_way_members, Q_WAY_MEMBERS_SQL),
    "extra_nodes": (q_extra_nodes, Q_EXTRA_NODES_SQL),
    "softcut_nodes_out": (q_softcut_nodes_out, Q_SOFTCUT_NODES_OUT_SQL),
    "relation_members": (q_relation_members, Q_RELATION_MEMBERS_SQL),
    "hardcut_way_clip": (q_hardcut_way_clip, Q_HARDCUT_WAY_CLIP_SQL),
    "hardcut_relation_clip": (q_hardcut_relation_clip, Q_HARDCUT_RELATION_CLIP_SQL),
    "knn_centroid": (q_knn_centroid, Q_KNN_CENTROID_SQL),
    "pages_split": (q_pages_split, Q_PAGES_SPLIT_SQL),
    "pages_passthrough": (q_pages_passthrough, Q_PAGES_PASSTHROUGH_SQL),
    "zorder": (q_zorder, Q_ZORDER_SQL),
    "hilbert": (q_hilbert, Q_HILBERT_SQL),
    "snapshot_diff": (q_snapshot_diff, _snapshot_diff_sql()),
}
