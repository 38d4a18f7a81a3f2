"""Physical-plan checks: the plans we designed for are the plans Catalyst
actually picks (SURVEY §4). A correct-but-mis-planned operator fails here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.spatial_join import assign_extracts
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

from .fixtures import golden_catalog, golden_nodes


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spatial_join_is_broadcast_no_cartesian(spark):
    cat = ExtractCatalog(
        [
            Extract.bbox("b1", -10.0, -10.0, 10.0, 10.0),
            Extract.poly(
                "p1", [[[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0], [0.0, 0.0]]]
            ),
        ]
    )
    df = assign_extracts(golden_nodes(spark), cat)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the big side is never shuffled for membership (no Exchange hashpartitioning
    # of the nodes relation before the join)
    assert "SortMergeJoin" not in plan


def test_parquet_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "pts")
    spark.range(10000).selectExpr(
        "id", "cast(id % 360 - 180 as double) AS lon",
        "cast(id % 180 - 90 as double) AS lat", "cast(id as string) AS payload"
    ).write.parquet(p)
    df = (
        spark.read.parquet(p)
        .filter((F.col("lon") > 0.0) & (F.col("lat") > 0.0))
        .select("id", "lon", "lat")  # payload must be pruned
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "GreaterThan(lon,0.0)" in plan, plan
    assert "payload" not in plan.split("ReadSchema")[1], plan


def test_whole_stage_codegen_on_membership_path(spark):
    """The bbox accept path must stay inside WholeStageCodegen (no Python)."""
    cat = golden_catalog()  # BBOX-only catalog -> no pandas UDF anywhere
    df = assign_extracts(golden_nodes(spark), cat)
    df.collect()  # AQE finalizes the physical plan only on execution
    plan = plan_of(df)
    # codegen'd operators render with a *(stage) prefix in the final plan
    import re

    assert re.search(r"\*\(\d+\) ", plan), plan
    assert "ArrowEvalPython" not in plan, "bbox-only catalog must not hit Python"


def test_assign_extracts_single_scan_per_resolution(spark, tmp_path):
    """The accept/refine branches are ONE combined filter: the big input is
    scanned once per distinct cover resolution, never once per branch."""
    p = str(tmp_path / "pts")
    spark.range(2000).selectExpr(
        "id", "cast(id % 360 - 180 as double) AS lon",
        "cast(id % 180 - 90 as double) AS lat"
    ).write.parquet(p)
    pts = spark.read.parquet(p)
    cat = ExtractCatalog(
        [
            Extract.bbox("b1", -10.0, -10.0, 10.0, 10.0),
            Extract.poly(
                "p1", [[[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0], [0.0, 0.0]]]
            ),
        ]
    )
    n_res = len(set(cat.resolutions().values()))
    plan = plan_of(assign_extracts(pts, cat))
    n_scans = plan.count("Scan parquet")
    assert n_scans == n_res, f"{n_scans} scans for {n_res} resolutions:\n{plan}"


def test_neardup_and_lsh_have_no_cartesian(spark, testdata_sf):
    """The near-dup scale paths must be bucketed equi-joins — a cross join
    anywhere is an instant 100-TB disqualifier."""
    from osm_history_splitter_spark.text_queries import (
        q_embedding_neardup,
        q_lsh_pairs,
        q_lsh_topk,
        q_ngram_jaccard,
    )

    for q in (q_embedding_neardup, q_lsh_pairs, q_ngram_jaccard, q_lsh_topk):
        plan = plan_of(q(spark, testdata_sf))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__


def test_decontaminate_broadcast_is_guarded(spark, testdata_sf):
    """Small bench set → explicit broadcast; bench set above the guard →
    shuffle equi-join (never an unbounded broadcast of a multi-GB gram
    set). Same results either way."""
    from osm_history_splitter_spark.text_queries import q_decontaminate

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = q_decontaminate(spark, testdata_sf)  # bench fits: broadcast
        assert "BroadcastHashJoin" in plan_of(small)
        big = q_decontaminate(spark, testdata_sf, broadcast_max=0)
        plan = plan_of(big)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        a = sorted((r["doc_id"], r["n_contaminated_grams"]) for r in small.collect())
        b = sorted((r["doc_id"], r["n_contaminated_grams"]) for r in big.collect())
        assert a == b and a
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_poly_catalog_refine_is_arrow_batched(spark):
    cat = ExtractCatalog(
        [Extract.poly("p", [[[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0], [0.0, 0.0]]])]
    )
    plan = plan_of(assign_extracts(golden_nodes(spark), cat))
    # the exact-PIP refine is vectorized (ArrowEvalPython), never a plain
    # row-at-a-time BatchEvalPython
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of join must compile to window-over-union: zero join nodes,
    exactly one exchange (the window partitioning)."""
    from osm_history_splitter_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100)], "event_id long, user_id long, tse long"
    )
    right = spark.createDataFrame(
        [(10, 50, 7)], "user_id long, snap_ts long, snap_id long"
    )
    df = asof_join(left, right, on=["user_id"], left_ts="tse",
                   right_ts="snap_ts", payload_cols=["snap_id"])
    plan = plan_of(df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    assert plan.count("Exchange") == 1, plan


def test_run_split_pass2_marker_side_is_shuffle_free(spark, tmp_path):
    """The bucketed-marker strategy wired into the REAL splitter: after
    run_split materializes its checkpoints, the actual pass-2 DAG
    (pass2_outputs — the same frames run_split writes) must read every
    marker side from the bucketed table with NO Exchange on it; the only
    Exchange feeds the entity side."""
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.checkpoint import StageStore
    from osm_history_splitter_spark.splitter import pass2_outputs, run_split

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [
            (int(i), 1, True, ts, 0, 0, "u",
             float(i % 90) - 45.0, float(i % 180) - 90.0, {})
            for i in range(3000)
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(10_000 + w, 1, True, ts, 0, 0, "u", [int(3 * w), int(3 * w + 1)], {})
         for w in range(500)],
        schema=WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [(50_000 + r, 1, True, ts, 0, 0, "u", [("w", 10_000 + r, "m")], {})
         for r in range(50)],
        schema=RELATION_SCHEMA,
    )
    cat = ExtractCatalog([Extract.bbox("mid", -60.0, -30.0, 60.0, 30.0)])
    out = str(tmp_path / "p2")
    run_split(spark, nodes, ways, rels, cat, out, mode="softcut")

    store = StageStore(spark, f"{out}/_checkpoints", bucket_by=("id", 8))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        outs = pass2_outputs(nodes, ways, rels, store)
        for name, df in outs.items():
            plan = plan_of(df)
            # marker side read as a bucketed scan, join co-located with it
            assert "SelectedBucketsCount" in plan, (name, plan)
            assert "SortMergeJoin" in plan, (name, plan)
            # exactly ONE Exchange: the entity side; the marker side is
            # pre-partitioned by the bucketed write
            assert plan.count("Exchange") == 1, (name, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_union_of_bucketed_tables_distinct_needs_plain_scan(spark, tmp_path):
    """Pins the Spark 4.1 sharp edge StageStore.load_plain works around:
    distinct() over a UNION of two same-bucketed scans plans WITHOUT an
    Exchange (the union claims a clustering it doesn't align), silently
    keeping cross-table duplicates. The engine must therefore union plain
    scans; this test documents the quirk and proves the workaround."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    a = spark.createDataFrame([(3, "x")], "id long, extract string")
    b = spark.createDataFrame([(1, "x"), (3, "x")], "id long, extract string")
    ta, tb = f"qa_{sfx}", f"qb_{sfx}"
    for nm, df, sub in ((ta, a, "a"), (tb, b, "b")):
        (df.repartition(8, "id").write.bucketBy(8, "id").sortBy("id")
            .option("path", str(tmp_path / sub)).saveAsTable(nm))
    try:
        bucketed = (
            spark.table(ta).unionByName(spark.table(tb)).distinct().count()
        )
        plain = (
            spark.read.parquet(str(tmp_path / "a"))
            .unionByName(spark.read.parquet(str(tmp_path / "b")))
            .distinct()
            .count()
        )
        assert plain == 2  # the workaround is correct
        if bucketed != 2:
            # the quirk is present in this Spark — exactly why load_plain
            # exists; if a future Spark fixes it, both paths agree and
            # this branch simply never fires
            assert bucketed == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_pass2_join_is_shuffle_free(spark, tmp_path):
    """The softcut docstring's 100-TB strategy — bucket entity tables and
    marker tables by id so pass-2 joins co-locate — must actually produce
    a shuffle-free plan (no Exchange feeding the join)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    nodes = spark.range(10000).selectExpr(
        "id", "1 AS version", "cast(id % 360 - 180 as double) AS lon"
    )
    markers = spark.range(0, 10000, 7).selectExpr("id", "'x' AS extract")
    nt, mt = f"nodes_b_{sfx}", f"markers_b_{sfx}"
    (nodes.write.bucketBy(8, "id").sortBy("id")
        .option("path", str(tmp_path / "nb")).saveAsTable(nt))
    (markers.write.bucketBy(8, "id").sortBy("id")
        .option("path", str(tmp_path / "mb")).saveAsTable(mt))
    try:
        # markers are tiny here so Catalyst would broadcast (also right at
        # scale); force the merge join to exercise the bucketed path the
        # docstring describes for planet-sized markers
        joined = spark.table(nt).hint("merge").join(
            spark.table(mt).hint("merge"), "id"
        )
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 1429
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {nt}")
        spark.sql(f"DROP TABLE IF EXISTS {mt}")


def test_bucketed_world_pass2_is_fully_shuffle_free(spark, tmp_path):
    """prepare_bucketed_world + bucketed marker checkpoints: when BOTH
    sides of the pass-2 joins share the id-bucketing, the join plans carry
    ZERO Exchange — the full 100-TB strategy, not just the marker half."""
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.checkpoint import StageStore
    from osm_history_splitter_spark.splitter import (
        pass2_outputs,
        prepare_bucketed_world,
        run_split,
    )

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [
            (int(i), 1, True, ts, 0, 0, "u",
             float(i % 90) - 45.0, float(i % 180) - 90.0, {})
            for i in range(2000)
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(10_000 + w, 1, True, ts, 0, 0, "u", [int(3 * w), int(3 * w + 1)], {})
         for w in range(300)],
        schema=WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [(50_000 + r, 1, True, ts, 0, 0, "u", [("w", 10_000 + r, "m")], {})
         for r in range(30)],
        schema=RELATION_SCHEMA,
    )
    cat = ExtractCatalog([Extract.bbox("mid", -60.0, -30.0, 60.0, 30.0)])
    out = str(tmp_path / "p2full")
    world = prepare_bucketed_world(
        spark, nodes, ways, rels, str(tmp_path / "world"), n_buckets=8
    )
    run_split(
        spark, world["nodes"], world["ways"], world["relations"], cat, out,
        mode="softcut", n_buckets=8,
    )

    store = StageStore(spark, f"{out}/_checkpoints", bucket_by=("id", 8))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        outs = pass2_outputs(
            world["nodes"], world["ways"], world["relations"], store
        )
        for name, df in outs.items():
            plan = plan_of(df)
            assert "SortMergeJoin" in plan, (name, plan)
            assert "SelectedBucketsCount" in plan, (name, plan)
            assert plan.count("Exchange") == 0, (name, plan)
        # and the result is the same split the plain-parquet path produces
        plain = pass2_outputs(nodes, ways, rels, store)
        for name in outs:
            a = sorted((r["id"], r["version"], r["extract"])
                       for r in outs[name].select("id", "version", "extract").collect())
            b = sorted((r["id"], r["version"], r["extract"])
                       for r in plain[name].select("id", "version", "extract").collect())
            assert a == b and a, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_corpus_clean_plan_shape(spark):
    """The cleaning funnel must stay a tree of hash joins on doc_id —
    no cartesian/nested-loop nodes anywhere in the composed plan."""
    from osm_history_splitter_spark.text_queries import q_corpus_clean

    plan = plan_of(q_corpus_clean(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_xml_sink_serialization_is_catalyst_only_one_exchange(spark):
    """The .osm/.osh sink's serialized frame: exactly ONE Exchange (the
    range partition that fixes element order) and NO Python in the row
    path — the XML string is built by Catalyst expressions."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_history_splitter_spark.model import NODE_SCHEMA
    from osm_history_splitter_spark.plans.osm_writer import element_xml_exprs

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [(1, 1, True, ts, 7, 70, "u", 0.5, 0.5, {"k": "v"})],
        schema=NODE_SCHEMA,
    ).withColumn("extract", F.lit("t"))
    ser = (
        nodes.select(
            "extract",
            F.lit(0).alias("type_rank"),
            "id",
            "version",
            element_xml_exprs(True)["node"].alias("value"),
        )
        .repartitionByRange(8, "extract", "type_rank", "id", "version")
        .sortWithinPartitions("extract", "type_rank", "id", "version")
        .select("extract", "value")
    )
    plan = plan_of(ser)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()


def test_pbf_sink_stage_is_one_exchange_then_arrow(spark):
    """The PBF sink's staged frame: one range Exchange, then the Arrow
    mapInPandas packer — no extra shuffle between sort and packing."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_history_splitter_spark.model import NODE_SCHEMA
    from osm_history_splitter_spark.plans.pbf_writer import (
        _KIND_COLS,
        _make_packer,
    )

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [(1, 1, True, ts, 7, 70, "u", 0.5, 0.5, {})], schema=NODE_SCHEMA
    ).withColumn("extract", F.lit("t"))
    staged = (
        nodes.select("extract", *_KIND_COLS["node"])
        .repartitionByRange(8, "extract", "id", "version")
        .sortWithinPartitions("extract", "id", "version")
        .withColumn("pid", F.spark_partition_id())
        .mapInPandas(
            _make_packer("node"),
            schema="extract string, pid int, seq long, blob binary",
        )
    )
    plan = plan_of(staged)
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan


def test_tile_and_geohash_encodes_are_pure_projection(spark, testdata_sf):
    """The cell-index encodes (XYZ tile + quadkey, geohash) are projections:
    zero Exchange, zero Python eval, whole-stage codegen."""
    from osm_history_splitter_spark.oracle_queries import (
        q_geohash_assign,
        q_tile_xyz,
    )

    for q in (q_tile_xyz, q_geohash_assign):
        plan = plan_of(q(spark, testdata_sf))
        assert plan.count("Exchange") == 0, plan
        assert "Python" not in plan, plan
        assert "*(1)" in plan, plan  # whole-stage codegen span


def test_link_graph_single_shuffle(spark, testdata_sf):
    """href mining is a projection; the ONLY Exchange is the final edge
    groupBy (plus its AQE final-agg read) — no join, no Python."""
    from osm_history_splitter_spark.text_queries import q_link_graph

    plan = plan_of(q_link_graph(spark, testdata_sf))
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    # one logical shuffle: partial agg -> Exchange -> final agg
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cms_sketch_is_bounded_and_broadcast(spark, testdata_sf):
    """The CMS build is ONE map-side-combinable groupBy over <= 4096
    cells; the probe estimate joins against the sketch via BROADCAST —
    the corpus is never reshuffled for the estimate step. No Python."""
    from osm_history_splitter_spark.text_queries import q_cms_counts

    plan = plan_of(q_cms_counts(spark, testdata_sf))
    assert "Python" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_hll_is_two_bounded_aggregates_no_python(spark, testdata_sf):
    """HLL state: groupBy(lang, reg) (<= |langs|*256 rows after partial
    agg) then groupBy(lang) — exactly two agg shuffles, zero joins, zero
    Python (the rho rank is a codegen indicator sum, not a UDF)."""
    from osm_history_splitter_spark.text_queries import q_hll_distinct

    plan = plan_of(q_hll_distinct(spark, testdata_sf))
    assert "Python" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_ring_self_join_is_gid_keyed_hash_join(spark):
    """The ring-validity join must be a hash equi-join whose key includes
    gid (candidates stay ring-local) — never a cartesian or broadcast-NL."""
    from osm_history_splitter_spark.operators.segjoin import (
        ring_self_intersections,
    )

    segs = spark.range(40).select(
        (F.col("id") % 5).alias("gid"),
        (F.col("id") % 8).alias("seq"),
        F.lit(8).alias("nseg"),
        (F.col("id") * 13 % 100).alias("x1"),
        (F.col("id") * 29 % 100).alias("y1"),
        (F.col("id") * 17 % 100).alias("x2"),
        (F.col("id") * 7 % 100).alias("y2"),
    )
    plan = plan_of(ring_self_intersections(segs, 16))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "gid" in plan.split("Join")[1][:200], plan


def test_co_citation_is_joinless_single_shuffle(spark, testdata_sf):
    """The bipartite projection happens INSIDE the row (indexed-lambda
    pair expansion): no join anywhere, one agg shuffle, no Python."""
    from osm_history_splitter_spark.text_queries import q_co_citation

    plan = plan_of(q_co_citation(spark, testdata_sf))
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_od_matrix_two_shuffles_no_join(spark, testdata_sf):
    """Sessionize + first/last marks + flow agg: the user_id Exchange
    feeds ALL the windows (the (user, sess_no) windows re-sort but never
    re-shuffle — hash(user) already clusters them), so the whole OD
    pipeline is exactly two Exchanges and zero joins."""
    from osm_history_splitter_spark.oracle_queries import q_od_matrix

    plan = plan_of(q_od_matrix(spark, testdata_sf))
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_triangles_all_equi_joins(spark):
    """Triangle listing is hash equi-joins only — no cartesian, no
    nested-loop — and the NMS hotspot op is explode + one agg, no join."""
    from osm_history_splitter_spark.operators.graph import triangles
    from osm_history_splitter_spark.operators.raster import local_maxima

    edges = spark.range(100).select(
        (F.col("id") % 20).alias("src"), (F.col("id") % 13).alias("dst")
    )
    plan = plan_of(triangles(edges))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan

    base = spark.range(50).select(
        (F.col("id") * 4294967296 + F.col("id") % 32).alias("cell"),
        (F.col("id") % 5 + 1).alias("n"),
    )
    nms = plan_of(local_maxima(base, 5, 2))
    assert "Join" not in nms, nms
    assert nms.count("Exchange hashpartitioning") == 1, nms


def test_box_blur_is_two_pass_and_morphology_one(spark):
    """The separable blur does exactly its two aggregate shuffles; dilate
    does exactly one distinct shuffle — no hidden joins or extra rounds."""
    from pyspark.sql import functions as F

    from osm_history_splitter_spark.operators.raster import box_blur, dilate

    base = spark.range(100).select(
        (F.col("id") * 4294967296 + F.col("id") % 32).alias("cell"),
        F.lit(1).cast("long").alias("n"),
    )
    blur_plan = plan_of(box_blur(base, 5, 2))
    assert blur_plan.count("Exchange hashpartitioning") == 2, blur_plan
    assert "Join" not in blur_plan
    dil_plan = plan_of(dilate(base.select("cell"), 5, 2))
    assert dil_plan.count("Exchange hashpartitioning") == 1, dil_plan


def test_assign_extracts_rejects_reserved_columns_and_empty_catalog(spark):
    import pytest

    from osm_history_splitter_spark.operators.spatial_join import (
        assign_extracts,
    )
    from osm_history_splitter_spark.plans.catalog import (
        Extract,
        ExtractCatalog,
    )

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    bad = spark.createDataFrame(
        [(0.5, 0.5, 7)], "lon double, lat double, cell long"
    )
    with pytest.raises(ValueError, match="reserved column"):
        assign_extracts(bad, cat)
    ok = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    with pytest.raises(ValueError, match="no extracts"):
        assign_extracts(ok, ExtractCatalog([]))
