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

__all__ = ["connected_components", "dedup_clusters"]


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
