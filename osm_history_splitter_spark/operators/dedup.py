"""Near-duplicate clustering: connected components over candidate pairs.

A dedup pipeline's last step groups pairwise near-dups into clusters and
keeps one canonical document per cluster. Pairs (from MinHash-LSH, n-gram
Jaccard or embedding LSH — all bounded, bucketed joins) form an undirected
graph; components are computed by iterative min-label propagation, the
same semi-naive shape as the relation closure (``closure.py``): each round
joins only the current labels against the edge list and keeps the minimum
label seen, terminating when no label changes.

Scale notes: dup clusters in web corpora are near-cliques (all members
share LSH buckets), so the diameter — and the round count — is tiny (1-3).
Each round shuffles only (doc_id, label) pairs; ``localCheckpoint``
truncates the growing lineage. Each round also POINTER-JUMPS
(label := label-of-label) after the neighbor-min step, so adversarially
long chains converge in O(log diameter) rounds instead of O(diameter):
labels only ever decrease and always name a vertex of the same component,
so jumping through the label's own label is sound; the fixpoint (labels
constant along edges, label self-mapped) is the component minimum either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "dedup_clusters",
    "exact_substring_spans",
]


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 30,
    _stats: dict | None = None,
) -> DataFrame:
    """(doc_id, cluster_id): min doc id reachable from each vertex of the
    pair graph. Only vertices that appear in some pair are returned.
    ``_stats``, when given, receives {"rounds": n} for convergence tests."""
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("t"))
        .unionByName(
            pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("t"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges["t"] == labels["doc_id"])
            .groupBy(F.col("s").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # pointer jump: lbl := lbl(lbl) — the label is itself a vertex, so
        # its (always ≤) label is a valid label for us; halves chain depth
        # every round → log(diameter) convergence on path graphs
        lbl_of = stepped.select(
            F.col("doc_id").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new_labels = (
            stepped.join(lbl_of, "lbl", "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce(F.col("lbl2"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("lbl", "old"), "doc_id")
            .filter(F.col("lbl") != F.col("old"))
            .limit(1)
            .count()  # bounded: LIMIT 1 probe, metadata-scale action
        )
        labels = new_labels
        if changed == 0:
            break
    if _stats is not None:
        _stats["rounds"] = rounds
    return labels.select("doc_id", F.col("lbl").alias("cluster_id"))


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): cluster = min doc id of the
    component; the canonical (kept) document is the cluster id itself."""
    cc = connected_components(pairs)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def exact_substring_spans(
    docs: DataFrame,
    min_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup (the suffix-array "deduplicating training data"
    operator, re-expressed for Spark): find every maximal token span that
    appears at least twice in the corpus — across documents OR within one —
    at granularity ``min_tokens``.

    Returns one row per (document, maximal duplicated span):
    ``(id_col, span_start, span_end, span_tokens, dup_grams)`` with 1-based
    inclusive token positions.

    Spark-first shape (the suffix array is inherently sequential; the
    distributed equivalent is gram fingerprinting):

    1. every ``min_tokens``-gram is fingerprinted (md5 over the joined
       slice) — pure Catalyst ``transform``/``slice``, no UDF;
    2. ONE window count partitioned by fingerprint marks grams occurring
       >= 2 times. No pair enumeration anywhere — a boilerplate gram shared
       by a million pages costs one count, not 10^12 pairs, so there is no
       hot-key blowup to cap;
    3. duplicated gram positions merge into maximal spans per document
       (gaps-and-islands: running max of span end, one window per doc).

    Total cost: one O(total tokens) shuffle on content hash (evenly
    distributed by construction) + one narrow per-document window.
    """
    L = int(min_tokens)
    if L < 2:
        raise ValueError(f"min_tokens must be >= 2, got {L}")
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    positions = F.when(
        n >= L, F.sequence(F.lit(1), n - F.lit(L) + 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = docs.select(
        F.col(id_col), ws.alias("__ws"), F.explode(positions).alias("pos")
    ).select(
        id_col,
        "pos",
        F.md5(F.array_join(F.slice("__ws", F.col("pos"), L), " ")).alias("h"),
    )
    from pyspark.sql import Window

    dup = (
        grams.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("c") >= 2)
        .select(id_col, "pos")
    )
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    prev_max = (
        F.max(F.col("pos") + F.lit(L - 1))
        .over(wdoc.rowsBetween(Window.unboundedPreceding, -1))
    )
    spans = dup.withColumn(
        "is_new",
        F.when(
            prev_max.isNull() | (F.col("pos") > prev_max + 1), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("is_new").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        spans.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("dup_grams"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("span_tokens"),
            F.col("dup_grams").cast("long").alias("dup_grams"),
        )
    )
