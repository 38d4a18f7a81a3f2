"""Approximate nearest neighbor over embedding columns.

- ``brute_force_topk``: exact cosine top-k baseline — numpy matrix product
  inside a vectorized pandas UDF against a broadcast query matrix (one BLAS
  GEMM per Arrow batch; never per-element Python).
- ``lsh_topk``: the scale path — random-hyperplane (SimHash) bucketing.
  Candidates share a signature bucket with the query (multi-probe over
  1-bit flips), exact rerank only within candidates. Hyperplanes are
  deterministic (seeded), so results are reproducible across runs/engines.

At 10^12 rows the brute force is a full scan per query batch; LSH reduces
it to |bucket| × queries with the bucket join shuffling only (cell, id)
pairs — same filter-and-refine shape as the spatial join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["brute_force_topk", "lsh_signature", "lsh_topk", "ivf_topk"]


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _reject_reserved(df: DataFrame, names: tuple, fn: str) -> None:
    """Internal join/projection columns must not pre-exist on the input —
    withColumn would silently overwrite them and the probe join would
    bind the wrong side (the assign_extracts API-boundary convention)."""
    bad = sorted(set(names) & set(df.columns))
    if bad:
        raise ValueError(
            f"{fn}: embeddings frame carries reserved column(s) {bad} — "
            "rename them before calling"
        )


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalize with the same zero-norm epsilon the candidate side
    uses: an all-zero query must yield sim 0 everywhere, never NaN
    (Spark sorts NaN above every double — arbitrary top-k)."""
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query vector against every row."""
    _reject_reserved(
        embeddings, ("cid", "s", "qpos", "sim", "rnk", "qid"),
        "brute_force_topk",
    )
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qmat = _unit_rows(qmat)

    sim_type = T.ArrayType(T.DoubleType())

    @F.pandas_udf(sim_type)
    def sims(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        s = m @ qmat.T  # one GEMM per Arrow batch
        return pd.Series(list(s))

    exploded = (
        embeddings.select(F.col(id_col).alias("cid"), sims(F.col(vec_col)).alias("s"))
        .select("cid", F.posexplode("s").alias("qpos", "sim"))
    )
    # qpos -> qid via a literal array lookup (constant-folded, stays in
    # codegen; no per-row Python)
    qid_lit = F.array(*[F.lit(int(q)) for q in qids])
    w = Window.partitionBy("qpos").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        exploded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.element_at(qid_lit, F.col("qpos") + 1).cast("long").alias("qid"),
            "rnk",
            "cid",
            "sim",
        )
    )


def lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``sig`` (int64 bucket id): sign bits of hyperplane dots."""
    planes = _hyperplanes(n_planes, dim, seed)

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        bits = (m @ planes.T) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(planes.shape[0]):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return df.withColumn("sig", sig(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 19,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a seeded random coarse quantizer (n_lists centroid
    directions) assigns every vector to its nearest list (one GEMM +
    argmax per Arrow batch — the inverted-file build); each query probes
    its ``n_probe`` nearest lists and reranks exactly within them.

    Unlike trained k-means IVF, the centroids are data-independent (seeded
    Gaussian, normalized) — deterministic, no training pass; recall is
    recovered by probing more lists. At scale the list id is a partition
    key: probing is a broadcast semi-join on ≤ n_probe keys per query.
    """
    _reject_reserved(
        embeddings, ("list_id", "qid", "cid", "v", "sim", "rnk"), "ivf_topk"
    )
    dim = len(queries[0][1])
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_lists, dim))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def list_id(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    inv = embeddings.withColumn("list_id", list_id(F.col(vec_col)))

    qids = [q[0] for q in queries]
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qn = _unit_rows(qmat)
    qsims = qn @ cents.T
    probe_rows = [
        (int(qid), int(l))
        for qi, qid in enumerate(qids)
        for l in np.argsort(-qsims[qi])[:n_probe]
    ]
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, list_id int")

    cand = inv.join(F.broadcast(probes), "list_id").select(
        "qid", F.col(id_col).alias("cid"), F.col(vec_col).alias("v")
    )
    qmap = {int(qid): qn[i] for i, qid in enumerate(qids)}

    @F.pandas_udf(T.DoubleType())
    def cos(qid: pd.Series, vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        qm = np.asarray([qmap[int(q)] for q in qid])
        return pd.Series(np.einsum("ij,ij->i", m, qm))

    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        cand.withColumn("sim", cos(F.col("qid"), F.col("v")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "cid", "sim")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 12,
    n_probes: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket join on LSH signature (multi-probe: the query's
    bucket + its ``n_probes`` 1-bit neighbors), exact cosine rerank within
    candidates. Broadcasts the (tiny) probe table, shuffles nothing big."""
    _reject_reserved(
        embeddings, ("sig", "qid", "cid", "v", "sim", "rnk"), "lsh_topk"
    )
    if dim is None:
        dim = len(queries[0][1])
    planes = _hyperplanes(n_planes, dim, seed)
    signed = lsh_signature(embeddings, dim, n_planes, seed, vec_col)

    qids = [q[0] for q in queries]
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qn = _unit_rows(qmat)
    margins = qmat @ planes.T
    qsigs = (margins > 0).astype(np.int64)
    probe_rows = []
    for qi, qid in enumerate(qids):
        base = 0
        for j in range(n_planes):
            base |= int(qsigs[qi, j]) << j
        probe_rows.append((qid, base))
        # probe the planes with the smallest |margin| — most likely flips
        order = np.argsort(np.abs(margins[qi]))[:n_probes]
        for j in order:
            probe_rows.append((qid, base ^ (1 << int(j))))
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, sig long").distinct()

    cand = signed.join(F.broadcast(probes), "sig").select(
        F.col("qid"), F.col(id_col).alias("cid"), F.col(vec_col).alias("v")
    )

    qmap = {int(qid): qn[i] for i, qid in enumerate(qids)}

    @F.pandas_udf(T.DoubleType())
    def cos(qid: pd.Series, vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        qm = np.asarray([qmap[int(q)] for q in qid])
        return pd.Series(np.einsum("ij,ij->i", m, qm))

    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        cand.withColumn("sim", cos(F.col("qid"), F.col("v")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "cid", "sim")
    )
