"""Link-graph centrality (PageRank) — iterative graph computation on the
web-page link graph.

The web-pipeline use: crawl prioritization and quality weighting over
page→page links, the analog of the reference's relation→relation member
graph (``softcut.hpp:240-260``) with "reachability" generalized to a
weighted fixpoint. The closure operator (``operators/closure.py``) answers
*which* vertices connect; this answers *how central* each one is.

Scale shape per iteration:
1. contributions: edges ⋈ ranks on ``src`` — ONE shuffle by src (AQE
   broadcasts the rank side when tiny); out-degree is joined from a
   precomputed (and reused) aggregate;
2. ``groupBy(dst).sum`` — ONE map-side-combinable shuffle by dst;
3. re-attach to the full vertex set with a left join so sink-only
   vertices keep the base rank.

Iterations chain lazily; ``checkpoint_every`` truncates the growing
lineage with ``localCheckpoint`` the same way the connected-components
loop does (``operators/dedup.py``). Skew: a mega-hub dst key (a page
everyone links to) concentrates one reducer — pre-aggregate per
partition handles it (sum is combinable); a mega-hub SRC fans out
map-side only, no shuffle amplification.

Determinism contract: all arithmetic is 64-bit integer on an integer
scale (``scale``), with truncating division (Spark ``div`` == DuckDB
``//`` for non-negative operands) — so a fixed iteration count is
bit-reproducible across engines and the oracle can unroll the loop in
SQL. Dangling-vertex mass is dropped (not redistributed) by both
formulations — the simplified PageRank variant; document if you need
the stochastic-matrix one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "bfs_levels",
    "sssp_dists",
    "triangles",
    "kcore",
    "hits",
]


def bfs_levels(
    edges: DataFrame, sources: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source, out to
    ``max_depth`` — the level-synchronous generalization of the closure
    loop (``operators/closure.py``): closure asks WHICH vertices are
    reachable, this also says HOW FAR, the primitive under crawl-frontier
    scheduling and link-distance features.

    ``edges(src, dst)`` directed; ``sources(id)``. Returns ``(id, level)``
    for every vertex whose min distance <= max_depth (level 0 = source).

    Scale shape per round: frontier ⋈ edges on src (ONE shuffle; AQE
    broadcasts a small frontier), distinct, anti-join against the visited
    set — the set-semantics trick that makes the loop SEMI-NAIVE: work per
    round is O(newly reached), not O(all reached), exactly like the
    reference's growing-bitset check-before-push
    (``softcut.hpp:240-260``). Each round's frontier is eagerly
    localCheckpoint-ed: lineage stays flat AND the emptiness probe reuses
    the materialized partitions instead of recomputing the chain.
    Determinism: a vertex is labeled on the round it is FIRST reached —
    min-level by construction, no tie to break."""
    visited = (
        sources.select("id")
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for level in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias("src")).distinct(), "src"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("level", F.lit(level).cast("long"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def triangles(edges: DataFrame) -> DataFrame:
    """Triangle listing over ``edges(src, dst)`` (direction ignored) —
    the clustering-coefficient / spam-farm-detection primitive on a web
    link graph. Returns each triangle once as ``(a, b, c)`` with
    ``a < b < c``.

    Degree-ordered compact-forward algorithm: every undirected edge is
    directed from its lower-(degree, id) endpoint to the higher, wedges
    are built only "forward" (both legs leaving the triangle's MINIMUM-
    key apex, legs ordered by key), and a wedge closes iff its cap edge
    exists. The per-vertex forward out-degree is O(√m) on any graph —
    so the wedge join materializes Σ d_fwd² = O(m^1.5) candidates, the
    theoretical optimum, instead of the Σ d² blowup a naive neighbor
    self-join produces on hub vertices (exactly the skew a web graph
    has). Three hash equi-joins, no cartesian; each triangle emitted
    exactly once (unique minimum apex — no distinct needed)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = und.join(
        deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    fwd = e.select(
        F.when(lower, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = fwd.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = fwd.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedge = e1.join(e2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    tri = wedge.join(
        fwd.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
    )
    t = F.array_sort(F.array("u", "v1", "v2"))
    return tri.select(
        t[0].alias("a"), t[1].alias("b"), t[2].alias("c")
    )


def sssp_dists(
    edges: DataFrame, sources: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Weighted single-source(s) shortest paths, bounded to ``max_hops``
    edges — the weighted generalization of :func:`bfs_levels` (link
    distance → crawl cost / latency distance).

    ``edges(src, dst, w)`` directed with NON-NEGATIVE integer weights;
    ``sources(id)``. Returns ``(id, dist)`` = the minimum path weight
    over paths of at most ``max_hops`` edges, for every vertex reachable
    within that bound (dist 0 at the sources). With nonnegative weights
    the bounded result equals true SSSP once the loop reaches fixpoint
    (it breaks early when a round improves nothing).

    Semi-naive Bellman-Ford: each round relaxes ONLY the out-edges of
    vertices whose best distance improved last round, yet the per-round
    distances equal full-relaxation Bellman-Ford rounds exactly — an
    unimproved vertex's relaxations can produce nothing new, since both
    its distance and its out-edges are unchanged since it last fired.
    So round h's table is the min over ≤h-hop paths, which is what the
    oracle's bounded WITH RECURSIVE computes. Per round: frontier ⋈
    edges on src (ONE shuffle; AQE broadcasts small frontiers), a
    map-side-combinable ``min`` by dst, one anti-ish improvement join
    against the best table; frontiers are eagerly localCheckpoint-ed so
    lineage stays flat and the emptiness probe reuses materialized
    partitions. Integer arithmetic throughout — bit-reproducible, so
    the DuckDB twin hashes exactly."""
    best = (
        sources.select("id")
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = best
    for _ in range(max_hops):
        cand = (
            edges.join(
                frontier.select(F.col("id").alias("src"), "dist"), "src"
            )
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).cast("long").alias("nd"),
            )
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        # ONE materialization job per round: `improved` checkpoints
        # lazily and materializes INSIDE the eager checkpoint of the new
        # best table; the emptiness probe then reads the already-cached
        # partitions. On the final (empty) round this builds one
        # redundant best — identical to the previous one — which is
        # cheaper than the extra job every productive round paid before.
        improved = (
            cand.join(best, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=False)
        )
        best = (
            best.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        if not improved.take(1):
            break
        frontier = improved
    return best


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    num_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Integer-scaled PageRank over ``edges(src: long, dst: long)``.

    Returns ``(id: long, pr: long)`` where ``pr`` is on ``scale`` (initial
    rank = ``scale``). ``vertices`` (``id``) defaults to all endpoint ids;
    pass the full corpus vertex set so link-less pages keep the base rank.

    Cache lifetime: ``verts``/``outdeg`` stay persisted after return —
    the result DataFrame references them, so the caller's first action
    reuses the cache instead of rebuilding the degree table. Long-lived
    sessions invoking many graphs should ``spark.catalog.clearCache()``
    between jobs (same contract as the splitter's marker tables).
    """
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = vertices.select("id").persist()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od")).persist()
    base = scale * (100 - damping_pct) // 100

    pr = verts.withColumn("pr", F.lit(scale).cast("long"))
    for it in range(num_iter):
        contrib = (
            edges.join(pr, edges["src"] == pr["id"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("id"), F.expr("pr div od").alias("c"))
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        pr = verts.join(sums, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).cast("long").alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < num_iter:
            pr = pr.localCheckpoint(eager=False)
    return pr


def kcore(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """The k-core of an undirected graph — the maximal subgraph where
    every vertex keeps ≥ ``k`` neighbors: the standard dense-community /
    spam-farm extractor over a host link graph (a crawl's "core web"),
    and the degeneracy layer under triangle/community work.

    ``edges(src, dst)`` in any orientation (each undirected edge once or
    twice — symmetrized and dedup'd internally; self-loops dropped).
    Returns ``(id, deg)``: the surviving vertices with their degree
    INSIDE the core. Exact fixpoint semantics: repeatedly delete every
    vertex of degree < k, simultaneously (the classic synchronous peel —
    deletion order never changes the fixpoint, which is why the result
    is well-defined and oracle-reproducible).

    Raises ``RuntimeError`` if the peel hasn't converged after
    ``max_rounds`` (the closure-loop convention: fail loudly, never
    return a non-fixpoint silently). Rounds needed = the longest peel
    chain, ≤ graph degeneracy-ish in practice — single digits on
    hub-skewed web graphs.

    Scale shape per round: ONE map-side-combinable degree agg + two
    anti-joins against the (usually tiny, AQE-broadcast) low-degree set;
    the edge set only shrinks. Eager ``localCheckpoint`` keeps lineage
    flat across rounds and materializes the emptiness probe's work for
    the next iteration instead of recomputing the whole peel history.
    """
    if k < 1:
        raise ValueError(f"k must be a positive integer, got {k}")
    e = edges.select(
        F.col("src").cast("long").alias("a"),
        F.col("dst").cast("long").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    alive = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # max_rounds + 1 convergence probes bracket max_rounds deletions, so
    # a peel chain of EXACTLY max_rounds rounds still converges (matches
    # the SQL twin, which unrolls max_rounds deletion rounds then reads
    # the fixpoint) — the last probe only checks, never deletes
    for round_no in range(max_rounds + 1):
        deg = alive.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        low = deg.filter(F.col("deg") < k).select("a").localCheckpoint(
            eager=True
        )
        if not low.take(1):
            return deg.select(
                F.col("a").alias("id"), F.col("deg").cast("long").alias("deg")
            )
        if round_no == max_rounds:
            break
        alive = (
            alive.join(low, "a", "left_anti")
            .join(low.select(F.col("a").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore did not converge within {max_rounds} peel rounds"
    )


def hits(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    num_iter: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """HITS hubs & authorities over a directed link graph — the classic
    Kleinberg companion to :func:`pagerank` on a crawl's page→page
    graph: authorities are pages many good hubs point AT, hubs are
    pages pointing at many good authorities (directories / link lists).
    PageRank ranks by endorsement flow; HITS separates the two roles —
    the pair is the standard seed-quality signal for crawl frontiers.

    ``edges(src, dst)`` directed, ``vertices(id)`` optional (defaults to
    all endpoints; pass the corpus vertex set so link-less pages appear
    with 0/0). Returns ``(id, auth, hub)`` integer-scaled.

    Determinism contract (why this is NOT float HITS): the usual L2
    normalization needs sqrt, which no cross-engine hash gate survives.
    Instead each half-step renormalizes by the MAX via truncating
    integer division — ``x' = x·scale div max(x)`` — which preserves the
    ranking exactly, keeps every value in ``[0, scale]`` (so sums fit
    int64 for any in-degree < 2^63/scale), and is bit-identical in
    Spark (``div``) and DuckDB (``//``) for the unrolled oracle twin.

    Scale shape per iteration: two (edges ⋈ scores → combinable
    groupBy) shuffles — by dst for the authority gather, by src for the
    hub gather — plus a 1-row max broadcast each; the vertex re-attach
    is a left join against the persisted vertex set. A mega-hub dst
    (everyone links to it) is absorbed map-side by the partial sum.
    """
    if num_iter < 1:
        raise ValueError(f"num_iter must be >= 1, got {num_iter}")
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if vertices is None:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    # localCheckpoint, not persist(): it materializes the double-used
    # vertex set the same way but is released by the ContextCleaner when
    # the result frame is garbage-collected — repeated hits() calls in
    # one session never accumulate dead cached partitions
    verts = vertices.select(
        F.col("id").cast("long").alias("id")
    ).localCheckpoint(eager=True)

    def _renorm(raw: DataFrame, col: str) -> DataFrame:
        """x·scale div max(x) over (id, col); empty/zero-safe."""
        mx = raw.agg(F.greatest(F.max(col), F.lit(1)).alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "id",
            F.expr(f"({col} * {scale}L) div mx").cast("long").alias(col),
        )

    hub = verts.withColumn("hub", F.lit(scale).cast("long"))
    auth = None
    for _ in range(num_iter):
        # lazy-checkpoint each gather BEFORE its renorm: the renorm's
        # 1-row max rides a broadcast subtree, which would otherwise
        # re-execute the whole gather a second time — and compound
        # across iterations (the next gather embeds this one twice)
        a_raw = (
            e.join(hub.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a"))
        ).localCheckpoint(eager=False)
        auth = _renorm(a_raw, "a")
        h_raw = (
            e.join(auth.select(F.col("id").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h"))
        ).localCheckpoint(eager=False)
        hub = _renorm(h_raw, "h").select(
            "id", F.col("h").alias("hub")
        ).localCheckpoint(eager=False)
    return (
        verts.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth"),
            F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub"),
        )
    )
