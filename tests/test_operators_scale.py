"""Scale-path operators: ring-expansion kNN == full-window kNN; LSH ANN
recall vs brute force; streaming hardcut == batch hardcut; multimodal
mapInPandas plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.ann import (
    brute_force_topk,
    lsh_topk,
)
from osm_history_splitter_spark.operators.knn import (
    knn_full_window,
    knn_to_centroids,
)

CENTROIDS = {"a": (3.0, 3.0), "b": (-50.0, 10.0), "c": (120.0, -40.0)}


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-180, 180, 3000), rng.uniform(-90, 90, 3000))
        )
    ]
    return spark.createDataFrame(rows, "id long, lon double, lat double")


def test_knn_ring_expansion_matches_full_window(spark, points):
    full = {
        (r["extract"], r["rnk"]): r["id"]
        for r in knn_full_window(points, CENTROIDS, 10).collect()
    }
    ring = {
        (r["extract"], r["rnk"]): r["id"]
        for r in knn_to_centroids(points, CENTROIDS, 10, res=6).collect()
    }
    assert ring == full


def test_knn_sparse_region_falls_back_exact(spark):
    """k larger than the point count reachable within max_ring: the ring
    expansion can't certify sufficiency, so the centroid must fall back to
    the exact full-window path instead of silently under-covering."""
    rows = [(0, 0.0, 0.0), (1, 170.0, 80.0), (2, -170.0, -80.0)]
    pts = spark.createDataFrame(rows, "id long, lon double, lat double")
    cents = {"c": (10.0, 10.0)}
    # only 3 points exist but k=5 — and max_ring=2 can't see the far ones
    full = {(r["extract"], r["rnk"]): r["id"]
            for r in knn_full_window(pts, cents, 5).collect()}
    ring = {(r["extract"], r["rnk"]): r["id"]
            for r in knn_to_centroids(pts, cents, 5, res=6, max_ring=2).collect()}
    assert ring == full and len(ring) == 3


def test_closure_pair_blowup_uses_distributed_loop(spark):
    """A deep chain within the edge-count threshold but whose transitive
    closure exceeds the pair cap must still converge (semi-naive loop)."""
    from osm_history_splitter_spark.operators.closure import relation_closure

    n = 45  # chain 0->1->...->45: closure pairs = n(n+1)/2 > 20*n
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "child long, parent long"
    )
    direct = spark.createDataFrame([(0, "x")], "id long, extract string")
    got = sorted(
        (r["id"], r["extract"])
        for r in relation_closure(direct, edges, driver_threshold=n).collect()
    )
    assert got == [(i, "x") for i in range(n + 1)]


def test_closure_nonconvergence_raises(spark):
    """A distributed-loop closure deeper than max_iterations must fail
    loudly — a truncated closure is silently-wrong membership."""
    import pytest

    from osm_history_splitter_spark.operators.closure import relation_closure

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "child long, parent long"
    )
    direct = spark.createDataFrame([(0, "x")], "id long, extract string")
    with pytest.raises(RuntimeError, match="did not converge"):
        # driver_threshold=0 forces the distributed semi-naive loop
        relation_closure(direct, edges, max_iterations=3, driver_threshold=0)
    # at sufficient depth the same call converges
    got = relation_closure(direct, edges, max_iterations=6, driver_threshold=0)
    assert got.count() == 6


def test_upward_nonconvergence_raises(spark):
    """The indexed-CDC upward affectedness closure shares the loud-failure
    contract (truncation would under-close the recompute set)."""
    import pytest

    from osm_history_splitter_spark.operators.incremental import _upward

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "child long, parent long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        _upward(seeds, edges, max_iterations=2)
    assert _upward(seeds, edges, max_iterations=6).count() == 6


def test_knn_skewed_cluster(spark):
    """>=50% of points in one cell (FIXTURES §7 skew case) — the expansion
    must still terminate and agree with the exact result."""
    rng = np.random.default_rng(5)
    hot = [(int(i), 10.0 + float(x) / 1e5, 10.0 + float(y) / 1e5)
           for i, (x, y) in enumerate(zip(rng.uniform(0, 1, 500), rng.uniform(0, 1, 500)))]
    cold = [(1000 + int(i), float(lon), float(lat))
            for i, (lon, lat) in enumerate(zip(rng.uniform(-180, 180, 300), rng.uniform(-90, 90, 300)))]
    pts = spark.createDataFrame(hot + cold, "id long, lon double, lat double")
    cents = {"hot": (10.0, 10.0), "far": (-170.0, -80.0)}
    full = {(r["extract"], r["rnk"]): r["id"] for r in knn_full_window(pts, cents, 7).collect()}
    ring = {(r["extract"], r["rnk"]): r["id"] for r in knn_to_centroids(pts, cents, 7, res=8).collect()}
    assert ring == full


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    # clustered vectors so ANN has structure to find
    centers = rng.standard_normal((5, 16))
    rows = []
    for i in range(400):
        c = centers[i % 5]
        v = c + 0.15 * rng.standard_normal(16)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark, embeddings):
    queries = [
        (r["vec_id"], r["embedding"])
        for r in embeddings.filter(F.col("vec_id") < 3).collect()
    ]
    res = brute_force_topk(embeddings, queries, k=5)
    rows = res.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        top1 = min(rs, key=lambda r: r["rnk"])
        assert top1["cid"] == qid  # self is its own nearest neighbor
        sims = [r["sim"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_brute_force(spark, embeddings):
    from osm_history_splitter_spark.operators.ann import ivf_topk

    queries = [
        (r["vec_id"], r["embedding"])
        for r in embeddings.filter(F.col("vec_id") < 5).collect()
    ]
    exact = brute_force_topk(embeddings, queries, k=5).collect()
    approx = ivf_topk(embeddings, queries, k=5, n_lists=8, n_probe=3).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["cid"])
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6


def test_raster_roundtrip_and_zonal(spark, points):
    from osm_history_splitter_spark.operators.raster import (
        cell_bounds,
        raster_to_points,
        rasterize,
        zonal_stats,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    r = rasterize(points, res=5)
    assert r.agg(F.sum("n")).collect()[0][0] == points.count()
    back = raster_to_points(r, res=5).collect()
    # every center must re-encode to its own cell
    from osm_history_splitter_spark.functions import grid as g
    import numpy as np

    for row in back[:50]:
        c = g.cell_ids_np(np.array([row["lon"]]), np.array([row["lat"]]), 5)[0]
        assert int(c) == row["cell"]
    bounds = cell_bounds(r, res=5).first()
    ring = bounds["ring"]
    assert ring[0] == ring[-1] and len(ring) == 5
    cat = ExtractCatalog([Extract.bbox("half", -180.0, -90.0, 0.0, 90.0)])
    z = zonal_stats(r, cat, res=5).collect()
    assert len(z) == 1 and 0 < z[0]["n_points"] < points.count()


def test_lsh_recall_vs_brute_force(spark, embeddings):
    queries = [
        (r["vec_id"], r["embedding"])
        for r in embeddings.filter(F.col("vec_id") < 5).collect()
    ]
    exact = brute_force_topk(embeddings, queries, k=5).collect()
    approx = lsh_topk(embeddings, queries, k=5, n_planes=10, n_probes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["cid"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6  # bucketing keeps most of top-5


def test_streaming_hardcut_matches_batch(spark, tmp_path):
    from osm_history_splitter_spark.model import NODE_SCHEMA
    from osm_history_splitter_spark.operators.spatial_join import assign_extracts
    from osm_history_splitter_spark.streaming.hardcut_stream import (
        read_node_stream,
        split_point_stream,
    )

    from .fixtures import golden_catalog, golden_nodes

    src = str(tmp_path / "src")
    golden_nodes(spark).write.parquet(src)
    stream = read_node_stream(spark, src, NODE_SCHEMA)
    q = split_point_stream(
        stream,
        golden_catalog(),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["version"], r["extract"])
        for r in spark.read.parquet(str(tmp_path / "out")).select(
            "id", "version", "extract"
        ).collect()
    }
    batch = {
        (r["id"], r["version"], r["extract"])
        for r in assign_extracts(golden_nodes(spark), golden_catalog())
        .select("id", "version", "extract")
        .collect()
    }
    assert got == batch


def test_multimodal_decode_and_frame_sample(spark):
    from osm_history_splitter_spark.functions.multimodal import (
        ASSET_SCHEMA,
        decode_assets,
        frame_sample,
    )

    rows = [
        (1, "image", b"img-bytes-1", {}),
        (2, "video", b"vid-bytes-2", {"codec": "fake"}),
        (3, "audio", b"", {}),
    ]
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    dec = decode_assets(df).collect()
    assert len(dec) == 3
    img = next(r for r in dec if r["asset_id"] == 1)
    assert img["n_frames"] == 1 and img["width"] >= 64
    # determinism: same bytes -> same sha
    dec2 = decode_assets(df).collect()
    assert {r["content_sha"] for r in dec} == {r["content_sha"] for r in dec2}

    frames = frame_sample(df.filter(F.col("kind") == "video"), every_n=10).collect()
    vid = next(r for r in dec if r["asset_id"] == 2)
    assert len(frames) == len(range(0, vid["n_frames"], 10))


def test_connected_components_chains_and_islands(spark):
    from osm_history_splitter_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # component {1,2,3,4} as a chain (diameter 3), component {10,11},
        # and a self-contained pair {20,21}
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"]): (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False),
    }


def test_lsh_cap_drops_are_observable_on_skewed_corpus(spark, tmp_path):
    """The hot-bucket cap must REPORT what it drops: a corpus with one
    degenerate bucket (boilerplate pages minhashing identically) above the
    cap yields non-zero dropped_rows/dropped_buckets counters riding the
    query's own action, and the pairs exclude the hot bucket."""
    from osm_history_splitter_spark import text_queries as tq

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(int(i), boiler, "en", "s", len(boiler)) for i in range(250)]
    rows += [
        (1000, "completely unique text about spark bucketing strategies", "en", "s", 55),
        (1001, "completely unique text about spark bucketing strategies!", "en", "s", 56),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    pairs = tq.q_lsh_pairs(spark, str(tmp_path)).collect()
    m = tq.cap_drop_metrics("lsh_pairs")
    assert m is not None
    # 250 identical docs share both band buckets (cap 200): 2 dropped
    # buckets, 250 rows dropped per band
    assert m["dropped_buckets"] == 2, m
    assert m["dropped_rows"] == 500, m
    docs_in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert not (docs_in_pairs & set(range(250)))  # hot bucket fully dropped
    assert (1000, 1001) in {(r["doc_a"], r["doc_b"]) for r in pairs}


def test_parent_cell_expr_works_on_any_expression(spark, points):
    """parent_cell_expr must derive BOTH axis indices from the passed
    expression — regression for the version that hardcoded a column
    literally named 'cell' for the x index."""
    from osm_history_splitter_spark.operators.raster import (
        parent_cell_expr,
        rasterize,
    )

    r = rasterize(points, res=5)
    via_cell = {
        row["p"]: row["n"]
        for row in r.select(parent_cell_expr(F.col("cell")).alias("p"), "n")
        .groupBy("p").agg(F.sum("n").alias("n")).collect()
    }
    renamed = r.withColumnRenamed("cell", "tile_id")
    via_renamed = {
        row["p"]: row["n"]
        for row in renamed.select(
            parent_cell_expr(F.col("tile_id")).alias("p"), "n"
        ).groupBy("p").agg(F.sum("n").alias("n")).collect()
    }
    # and a computed expression, not a bare column
    via_expr = {
        row["p"]: row["n"]
        for row in r.select(
            parent_cell_expr(F.col("cell") + F.lit(0)).alias("p"), "n"
        ).groupBy("p").agg(F.sum("n").alias("n")).collect()
    }
    assert via_cell and via_cell == via_renamed == via_expr


def test_tile_pyramid_equals_direct_rasterize(spark, points):
    """Each pyramid level (rolled up 4-children->parent from the level
    above) must equal rasterizing the raw points directly at that res."""
    from osm_history_splitter_spark.operators.raster import rasterize, tile_pyramid

    pyr = tile_pyramid(rasterize(points, res=6), 6, 4)
    for res in (6, 5, 4):
        got = {
            (r["cell"]): r["n"]
            for r in pyr.filter(F.col("res") == res).collect()
        }
        want = {r["cell"]: r["n"] for r in rasterize(points, res=res).collect()}
        assert got == want, res


def test_pack_sequences_bucketed_bounds_partitions_and_packs_exactly(spark):
    """The (lang, bucket) subdivision must (a) pack every doc exactly
    once, (b) produce exact concat-and-chunk layout WITHIN each bucket
    (offsets advance by n_tokens mod the budget, bins are dense), and
    (c) actually subdivide: no (lang, bucket) group holds a whole
    language once the language outgrows one bucket."""
    from osm_history_splitter_spark import text_queries as tq

    sf = "/root/testdata/sf0.01"
    out = tq.q_pack_sequences_bucketed(spark, sf)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs

    # exact layout within every (lang, bucket): replay the cumsum
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[(r["lang"], r["bucket"])].append(r)
    assert len(groups) > len({r["lang"] for r in rows})  # subdivided
    for (lang, bucket), g in groups.items():
        g.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in g:
            assert r["bin_id"] == cum // tq.PACK_BUDGET
            assert r["bin_offset"] == cum % tq.PACK_BUDGET
            assert r["pack_key"] == bucket * (1 << 40) + r["bin_id"]
            cum += r["n_tokens"]
        # bound check: the hottest group stays well under the whole corpus
        assert len(g) < n_docs / 2

    # plan: the window partitions by BOTH keys (bounded sort partitions)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(lang" not in plan.lower().replace(
        " ", ""
    ) or "bucket" in plan.lower()


def test_mixture_sample_fills_budgets_minimally(spark):
    """Per language: kept docs in hash order fill the lang's share of
    the token budget; only the LAST kept doc may overshoot (dropping it
    lands under budget), and nothing outside the mixture appears."""
    from osm_history_splitter_spark import text_queries as tq

    rows = tq.q_mixture_sample(spark, "/root/testdata/sf0.01").collect()
    assert {r["lang"] for r in rows} <= set(tq.MIXTURE_WEIGHTS)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    docs_df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lang_docs = {
        r["lang"]: r["n"]
        for r in docs_df.groupBy("lang").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    filled = 0
    for lang, docs in by_lang.items():
        budget = int(tq.MIXTURE_WEIGHTS[lang] * tq.MIXTURE_BUDGET)
        total = sum(d["n_tokens"] for d in docs)
        # minimal: every kept doc started under the line
        assert max(d["cum_tokens"] - d["n_tokens"] for d in docs) < budget
        if total >= budget:
            filled += 1
            # dropping the last kept doc goes under budget
            assert total - max(
                d["n_tokens"]
                for d in docs
                if d["cum_tokens"] == max(x["cum_tokens"] for x in docs)
            ) < budget
        else:
            # under-filled ⇒ the language's corpus is exhausted
            assert len(docs) == lang_docs[lang]
    assert filled >= 1  # the budget binds somewhere — cutoff non-vacuous


def test_closure_converges_exactly_at_iteration_cap(spark):
    """A chain whose last parent is discovered in the FINAL permitted
    round is a complete fixpoint — the cap check must verify the final
    frontier has no further ancestors before declaring non-convergence
    (round-5 off-by-one)."""
    from osm_history_splitter_spark.operators.closure import relation_closure

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "child long, parent long"
    )
    direct = spark.createDataFrame([(0, "x")], "id long, extract string")
    got = relation_closure(direct, edges, max_iterations=5, driver_threshold=0)
    assert got.count() == 6


def test_ann_zero_query_vector_yields_zero_sims_not_nan(spark):
    """An all-zero query must produce sim 0 everywhere (deterministic),
    never NaN (which Spark sorts above every double — arbitrary top-k)."""
    import math

    from osm_history_splitter_spark.operators.ann import brute_force_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = brute_force_topk(emb, [(99, [0.0, 0.0])], k=3).collect()
    assert len(out) == 3
    assert all(not math.isnan(r["sim"]) and r["sim"] == 0.0 for r in out)


def test_ann_rejects_reserved_columns(spark):
    import pytest

    from osm_history_splitter_spark.operators.ann import ivf_topk, lsh_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 5)], "vec_id long, embedding array<double>, qid long"
    )
    with pytest.raises(ValueError, match="reserved"):
        ivf_topk(emb, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="reserved"):
        lsh_topk(emb, [(0, [1.0, 0.0])])
