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

#: broadcast the per-vertex label table in the CC loop below this many
#: vertices (~16 B/row → tens of MB built; well under the 8 GB broadcast
#: cap). The vertex set of a dedup pair graph is the documents that
#: appear in SOME near-dup pair — usually a small fraction of the
#: corpus — but it is unbounded, so past the cap the loop falls back to
#: plain shuffle joins.
CC_BROADCAST_MAX_VERTICES = 2_000_000

#: run union-find on the driver below this many (directed) edges — the
#: closure.py driver-fast-path pattern: each distributed round costs
#: whole jobs of fixed overhead, while ≤ 1M edges are a one-job Arrow
#: collect (~16 MB) and a sub-second local pass. Past the cap the
#: semi-naive loop below runs unchanged.
CC_DRIVER_FASTPATH_MAX_EDGES = 1_000_000


def _driver_union_find(edges_pdf) -> dict:
    """Min-label union-find with path halving over a two-column pandas
    frame of (s, t) int64 edges; returns {vertex: component_min}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for s, t in zip(edges_pdf["s"].to_list(), edges_pdf["t"].to_list()):
        if s not in parent:
            parent[s] = s
        if t not in parent:
            parent[t] = t
        rs, rt = find(s), find(t)
        if rs != rt:
            # union by min keeps every root = current component minimum
            if rs < rt:
                parent[rt] = rs
            else:
                parent[rs] = rt
    return {v: find(v) for v in parent}


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 30,
    _stats: dict | None = None,
    driver_fastpath_max: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_id): min doc id reachable from each vertex of the
    pair graph. Only vertices that appear in some pair are returned.
    ``_stats``, when given, receives {"rounds": n} for convergence tests
    (0 = the driver fast path ran). ``driver_fastpath_max`` overrides
    :data:`CC_DRIVER_FASTPATH_MAX_EDGES` (tests pass 0 to force the
    distributed loop)."""
    if driver_fastpath_max is None:
        driver_fastpath_max = CC_DRIVER_FASTPATH_MAX_EDGES
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("t"))
        .unionByName(
            pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("t"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()  # bounded: metadata action on the checkpoint
    if n_edges <= driver_fastpath_max:
        # driver fast path (the closure.py pattern): the collect is
        # bounded by the threshold (≤ ~16 MB of two int64 columns via
        # Arrow), and union-find replaces every distributed round
        spark = pairs.sparkSession
        comp = _driver_union_find(edges.toPandas())
        if _stats is not None:
            _stats["rounds"] = 0
        return spark.createDataFrame(
            list(comp.items()), "doc_id long, cluster_id long"
        )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # size-probed broadcast of the label table (the decontaminate
    # pattern): below the cap, every per-round join builds a broadcast
    # hash map over the MATERIALIZED labels instead of shuffling the
    # (much larger, checkpointed) edge frame three times a round — the
    # heavy relation never moves. Above the cap the shuffle joins below
    # run unchanged (bounded probe: a count over the checkpointed
    # frame, one metadata-scale job).
    n_vertices = labels.count()
    bcast = n_vertices <= CC_BROADCAST_MAX_VERTICES

    def _lab(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            edges.join(_lab(labels), edges["t"] == labels["doc_id"])
            .groupBy(F.col("s").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("lbl").alias("old"),
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # pointer jump ×2: lbl := label-of-label-of-label — a label is
        # itself a vertex, so its (always ≤) label is a valid label for
        # us; two chained jumps roughly triple the reach per round →
        # log(diameter) convergence on path graphs. The jump table is
        # the PREVIOUS round's materialized labels (not ``stepped``):
        # joining ``stepped`` against a projection of itself would
        # compute the neighbor-min subtree twice per round, and the old
        # label of the new label is still a same-component, ≤-label
        # vertex — the fixpoint (labels constant along edges,
        # self-mapped) is identical.
        lbl_of = labels.select(
            F.col("doc_id").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        lbl_of2 = labels.select(
            F.col("doc_id").alias("lbl2"), F.col("lbl").alias("lbl3")
        )
        # the round's input label rides along as ``old``, so convergence
        # is a per-row compare INSIDE the round's own plan — the
        # detection join of the previous shape (new vs old labels) and
        # its separate probe job are gone: ONE job per round (the agg
        # below materializes the lazy localCheckpoint and answers the
        # fixpoint test together; labels only ever decrease, so
        # max(chg)=0 ⟺ elementwise equality ⟺ fixpoint)
        j1 = stepped.join(_lab(lbl_of), "lbl", "left").select(
            "doc_id",
            "old",
            F.least(F.col("lbl"), F.coalesce(F.col("lbl2"), F.col("lbl"))).alias(
                "lbl2"
            ),
        )
        final = F.least(
            F.col("lbl2"), F.coalesce(F.col("lbl3"), F.col("lbl2"))
        )
        new_labels = (
            j1.join(_lab(lbl_of2), "lbl2", "left")
            .select(
                "doc_id",
                final.alias("lbl"),
                (final != F.col("old")).alias("chg"),
            )
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
        changed = new_labels.agg(
            F.max(F.col("chg").cast("int"))
        ).first()[0]  # bounded: 1-row aggregate, metadata-scale action
        labels = new_labels.select("doc_id", "lbl")
        if not changed:
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
