"""Round-6 profiling harness: noop-sink isolation of hot-query stages
(guide §1.4). Not part of the frozen bench — numbers are cited in
OPTIMIZATION_r06.md.

Usage: python tools/profile_r06.py <section> [...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from osm_history_splitter_spark import oracle_queries as oq  # noqa: E402
from osm_history_splitter_spark import text_queries as tq  # noqa: E402
from osm_history_splitter_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df, label):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt:7.3f}s")
    spark.sparkContext.setJobDescription(None)
    return dt


def count(df, label):
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt:7.3f}s rows={n}")
    return n


def sec_colocation(spark):
    from osm_history_splitter_spark.oracle_queries import (
        COLOC_TAU,
        _event_pos,
    )

    pos = _event_pos(spark, SF)
    noop(pos, "colocation: _event_pos")
    # span / bucket stats (bounded: aggregates only)
    t = F.col("tse")
    stats = pos.select(
        F.min(t), F.max(t), F.countDistinct("cell"), F.count(F.lit(1))
    ).first()
    print("tse span:", stats)
    base = pos.select(
        F.col("user_id").cast("long").alias("u"),
        F.col("event_id").cast("long").alias("e"),
        F.col("tse").cast("long").alias("t"),
        "cell",
    )
    tau = COLOC_TAU
    bucket = (F.col("t") - F.col("t") % F.lit(tau)) / tau
    lhs = base.select(
        F.col("u").alias("ua"), F.col("e").alias("ea"),
        F.col("t").alias("ta"), "cell", bucket.cast("long").alias("tb"),
    )
    rhs = base.select(
        F.col("u").alias("ub"), F.col("e").alias("eb"),
        F.col("t").alias("tb_time"), "cell",
        F.explode(
            F.array(
                bucket.cast("long") - 1,
                bucket.cast("long"),
                bucket.cast("long") + 1,
            )
        ).alias("tb"),
    )
    joined = lhs.join(rhs, ["cell", "tb"])
    count(joined.select(F.lit(1)), "colocation: raw join size")
    pairs = joined.filter(
        (F.col("ua") < F.col("ub"))
        & (F.abs(F.col("ta") - F.col("tb_time")) <= tau)
    )
    noop(pairs.select("ua", "ub", (F.col("ta") - F.col("tb_time")).alias("g")),
         "colocation: pairs after filter")
    full = oq.q_colocation(spark, SF)
    noop(full, "colocation: full query (noop)")
    count(full, "colocation: full query (count)")


def sec_lsh(spark):
    from osm_history_splitter_spark.functions.text import (
        minhash_signature,
        shingles,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    sh = shingles(d)
    noop(sh, "lsh: shingles explode")
    sig = minhash_signature(sh, k=4)
    noop(sig, "lsh: minhash signatures")
    noop(tq.q_minhash_sig(spark, SF), "lsh: q_minhash_sig")
    full = tq.q_lsh_pairs(spark, SF)
    noop(full, "lsh: q_lsh_pairs full")


def sec_corpus(spark):
    noop(tq.q_quality_score(spark, SF), "corpus: quality_score")
    noop(tq.q_dedup_exact(spark, SF), "corpus: dedup_exact")
    noop(tq.q_decontaminate(spark, SF), "corpus: decontaminate")
    noop(tq.q_lsh_pairs(spark, SF), "corpus: lsh_pairs (again)")
    noop(tq.q_dedup_clusters(spark, SF), "corpus: dedup_clusters")
    noop(tq.q_corpus_clean(spark, SF), "corpus: corpus_clean full")


def sec_markers(spark):
    from osm_history_splitter_spark.oracle_queries import (
        catalog,
        hierarchy_relations,
        order_ways,
        part_nodes,
    )
    from osm_history_splitter_spark.operators.softcut import (
        softcut_membership,
    )

    noop(part_nodes(spark, SF), "markers: part_nodes")
    noop(order_ways(spark, SF), "markers: order_ways (collect_list)")
    noop(hierarchy_relations(spark, SF), "markers: hierarchy_relations")
    m = softcut_membership(
        part_nodes(spark, SF), order_ways(spark, SF),
        hierarchy_relations(spark, SF), catalog(), persist=False,
    )
    noop(m.node_members, "markers: node_members")
    noop(m.way_members, "markers: way_members (no persist!)")
    ways = order_ways(spark, SF)
    way_refs = ways.select("id", F.explode("refs").alias("ref")).distinct()
    noop(way_refs, "markers: way_refs explode+distinct")
    # the full persisted DAG as the bench sees it (cold)
    t0 = time.perf_counter()
    mm = oq.world_membership(spark, SF)
    n = mm.all_nodes().count()
    print(f"{'markers: world_membership all_nodes cold':50s} "
          f"{time.perf_counter() - t0:7.3f}s rows={n}")
    t0 = time.perf_counter()
    n = mm.relation_members.count()
    print(f"{'markers: relation_members (markers hot)':50s} "
          f"{time.perf_counter() - t0:7.3f}s rows={n}")


SECTIONS = {
    "colocation": sec_colocation,
    "lsh": sec_lsh,
    "corpus": sec_corpus,
    "markers": sec_markers,
}


def main():
    spark = get_spark("profile-r06")
    spark.sparkContext.setLogLevel("ERROR")
    # suite-style warmup
    spark.read.parquet(f"{SF}/part.parquet").count()
    for name in sys.argv[1:] or list(SECTIONS):
        print(f"--- {name} ---")
        SECTIONS[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
