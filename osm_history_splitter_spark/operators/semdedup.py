"""SemDeDup-style semantic deduplication over embedding clusters.

The public SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means
the embedding space, then drop near-duplicates WITHIN each cluster by
pairwise cosine — the clustering bounds the quadratic step to cluster
size, never corpus size. This is the embedding-space sibling of the
MinHash/LSH text paths (``text_queries.q_lsh_pairs``) and composes the
repo's deterministic :func:`~.kmeans.kmeans` with a per-cluster
Arrow-batched GEMM.

Decision rule (deterministic, oracle-expressible): within a cluster,
vector ``j`` is dropped iff ANY lower-vid vector ``i`` in the same
cluster has ``cos(i, j) >= threshold`` — the lowest vid of each
similarity neighborhood survives. (The paper keeps one arbitrary /
centroid-farthest representative per ε-ball; "dominated by any earlier"
is the monotone variant whose twin is a plain pairwise EXISTS, and it
dedups at least as aggressively on chains.) The cosine test is the exact
shape the certified ``embedding_neardup`` query uses: integer dot and
norms (exact in int64 under the QUANT scale), compared in float64 —
IEEE-identical across numpy, Catalyst, and DuckDB.

Scale posture: the k-means step is one narrow shuffle per iteration
(``operators/kmeans.py``); the dedup step is ``applyInPandas`` over the
cluster key — one GEMM per cluster, Arrow in/out, no pairwise rows ever
materialized in the plan. Clusters larger than ``cluster_cap`` are NOT
silently truncated: their rows pass through with ``attempted = false``
(observable via a plain filter), the same honest-drop contract as the
LSH hot-bucket caps. At 100 TB the knobs are ``k`` (cluster size ≈
corpus/k; raise k until caps stop firing) and ``cluster_cap`` (the GEMM
memory bound per task: cap² int64 ≈ 0.8 GB at 10k).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans

__all__ = ["semdedup"]

_OUT_SCHEMA = "vid long, cluster int, kept boolean, attempted boolean"


def _dedup_cluster(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    import numpy as np

    pdf = pdf.sort_values("vid").reset_index(drop=True)
    x = np.stack(pdf["q"].to_numpy()).astype("int64")  # (n, dim), exact
    g = x @ x.T  # int64 dots — exact under QUANT (|dot| < 2^53)
    n2 = np.diag(g).astype("float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = g.astype("float64") / np.sqrt(np.outer(n2, n2))
    hit = (g > 0) & (sims >= threshold)  # dot>0 guards zero vectors (nan)
    strict_upper = np.triu(np.ones(len(pdf), dtype=bool), k=1)
    dominated = (hit & strict_upper).any(axis=0)
    return pd.DataFrame(
        {
            "vid": pdf["vid"],
            "cluster": pdf["cluster"].astype("int32"),
            "kept": ~dominated,
            "attempted": True,
        }
    )


def semdedup(
    vectors: DataFrame,
    k: int = 8,
    num_iter: int = 2,
    threshold: float = 0.9,
    cluster_cap: int = 10_000,
) -> DataFrame:
    """Flag semantic near-duplicates in ``vectors(vid: long, q:
    array<long>)``. Returns one row per input vector: ``(vid, cluster,
    kept, attempted)`` — ``kept = false`` marks a dropped duplicate,
    ``attempted = false`` marks rows of clusters over ``cluster_cap``
    (passed through undeduped; count them, then re-run with higher ``k``)."""
    assigned, _cents = kmeans(vectors, k=k, num_iter=num_iter)
    with_q = assigned.select("vid", "cluster").join(vectors, "vid")
    sizes = with_q.groupBy("cluster").agg(F.count(F.lit(1)).alias("csz"))
    sized = with_q.join(F.broadcast(sizes), "cluster")

    oversized = sized.filter(F.col("csz") > cluster_cap).select(
        "vid",
        F.col("cluster").cast("int").alias("cluster"),
        F.lit(True).alias("kept"),
        F.lit(False).alias("attempted"),
    )
    small = sized.filter(F.col("csz") <= cluster_cap).select(
        "vid", "cluster", "q"
    )
    deduped = small.groupBy("cluster").applyInPandas(
        lambda pdf: _dedup_cluster(pdf, threshold), _OUT_SCHEMA
    )
    return deduped.unionByName(oversized)
