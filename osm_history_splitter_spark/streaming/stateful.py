"""Stateful / windowed Structured Streaming operators (SURVEY §2.7 — the
training-pipeline streaming layer beyond the stream-static hardcut).

- ``hourly_rollup_stream``: watermarked tumbling-window aggregation — the
  streaming twin of ``text_queries.q_events_hourly``. Late events beyond
  the watermark are dropped deterministically; windows close and emit once
  (append mode) so the sink is an incremental, exactly-once ledger.
- ``sessionize_stream``: custom stateful operator via
  ``applyInPandasWithState`` — per-user session assignment with a 30-min
  inactivity gap, the streaming twin of ``text_queries.q_sessionize``.
  Spark has no built-in session operator with this exact gap semantics +
  per-session aggregates, so this is the (b)-tier escape hatch the brief
  prescribes: Arrow-batched state updates, never per-row Python.

State scale: the session state is one small tuple per ACTIVE user (last
event second, open-session number, open-session aggregates) — at 10^9
users that is a few GB spread across executors via the groupBy hash
partitioning; the GroupStateTimeout evicts idle users, bounding it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "hourly_rollup_stream",
    "sessionize_stream",
    "dedup_stream",
    "interval_join_stream",
    "cms_sketch_stream",
    "hll_registers_stream",
    "trending_counts_stream",
    "rasterize_stream",
    "event_cell_counts",
    "SESSION_GAP_SEC",
]

SESSION_GAP_SEC = 1800

_SESSION_OUT_SCHEMA = (
    "user_id long, sess_no long, n_events long, start_epoch long, end_epoch long"
)
_SESSION_STATE_SCHEMA = (
    "last_ts long, sess_no long, n_events long, start_epoch long"
)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked hourly rollup (streaming twin of ``q_events_hourly``).

    Returns an unstarted streaming DataFrame; callers attach a sink. The
    aggregates are the same integer-cents sums as the batch/oracle query,
    so a drained (availableNow) run is row-identical to the batch result.
    """
    # watermarks require TIMESTAMP (not NTZ); the session runs UTC so the
    # cast is value-identical to the batch query's NTZ arithmetic
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def trending_counts_stream(
    docs: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Watermarked per-window token counts — the streaming half of the
    trending-terms query (``text_queries.q_trending_terms``): tumbling
    TREND_WIN windows over the synthetic crawl time, one count row per
    (window, token), append mode. The top-k RANK step is serving-side —
    a WindowGroupLimit over closed windows at read time — because a
    rank can flip while a window is open; the counts are the part with
    unbounded input, and their state is bounded by (open windows ×
    vocabulary). A drained (availableNow) backlog equals the batch
    query's pre-rank counts row-for-row, and ranking the drained sink
    reproduces the batch top-k exactly
    (tests/test_streaming_stateful.py)."""
    from ..text_queries import TREND_WIN, _trend_tse

    tse = _trend_tse()
    stamped = docs.withColumn(
        "ts", F.timestamp_seconds(tse).cast("timestamp")
    )
    return (
        stamped.withWatermark("ts", watermark)
        .select(
            "ts", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(
            F.window("ts", f"{TREND_WIN} seconds").alias("w"), "token"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long")
            .alias("win_epoch"),
            "token",
            "n",
        )
    )


def cms_sketch_stream(docs: DataFrame) -> DataFrame:
    """Streaming count-min sketch over a document stream — the streaming
    twin of the batch sketch in ``text_queries.cms_sketch`` (it IS that
    function applied to an unbounded frame; identity by construction).

    The state is the sketch itself: ≤ DEPTH·WIDTH counter rows total,
    REGARDLESS of stream length — the rare aggregation whose state never
    grows, which is exactly why sketches are the right way to track
    token/URL/host frequencies on an endless crawl. Run it in
    ``complete`` output mode: the whole (tiny) sketch re-emits per
    trigger, so the sink always holds the current frequency state and a
    drained backlog equals the batch sketch row-for-row
    (tests/test_streaming_stateful.py)."""
    from ..text_queries import cms_sketch

    return cms_sketch(docs)


def hll_registers_stream(docs: DataFrame) -> DataFrame:
    """Streaming HyperLogLog registers — the distinct-cardinality twin of
    :func:`cms_sketch_stream`, same bounded-state argument: the per-lang
    register table tops out at |langs|·256 rows no matter how long the
    crawl runs, and ``max`` is idempotent, so complete mode re-emits the
    exact current state per trigger. A drained backlog equals the batch
    ``text_queries.hll_registers`` row-for-row (shared builder —
    identity by construction)."""
    from ..text_queries import hll_registers

    return hll_registers(docs)


def event_cell_counts(events: DataFrame, res: int) -> DataFrame:
    """Shared heatmap builder (batch AND streaming — identity by
    construction, the cms/hll twin pattern): grid-cell counts of the
    deterministic od-matrix event positions at resolution ``res``."""
    from ..functions import grid
    from ..functions.eventpos import event_lon_lat

    k, e = F.col("user_id").cast("long"), F.col("event_id").cast("long")
    lon, lat = event_lon_lat(k, e)
    return (
        events.select(grid.cell_id_expr(lon, lat, res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def rasterize_stream(events: DataFrame, res: int = 5) -> DataFrame:
    """Streaming heatmap / live density raster — the spatial member of
    the complete-mode bounded-state family (CMS: frequencies, HLL:
    cardinality, THIS: the map): per-cell event counts whose state tops
    out at the occupied-cell count (≤ 2^(2·res+1) for the whole planet,
    2 048 cells at res 5) no matter how long the stream runs, and
    ``count`` is a plain running sum, so complete mode re-emits the
    exact current raster per trigger. A drained backlog equals the
    batch builder row-for-row (shared builder — identity by
    construction; tests/test_streaming_stateful.py). Downstream raster
    ops (box_blur → KDE, local_maxima → live hotspots, raster_gradient
    → drift) consume each emitted snapshot as an ordinary raster."""
    return event_cell_counts(events, res)


def _make_session_fn(evict_ms: int):
    """Build the per-user state function as a CLOSURE: cloudpickle ships a
    nested function by value (with its captured cells), while a
    module-level function is pickled by reference and re-imported on
    executors — a module-global eviction flag would silently reset there.
    """

    def _session_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-user session assignment over Arrow batches. Emits every
        session touched in this trigger (closed sessions are final; the
        open session re-emits with updated aggregates on later triggers —
        a sink keyed on (user_id, sess_no) upserts to the exact batch
        semantics)."""
        (user_id,) = key
        if state.exists:
            last_ts, sess_no, n_events, start_epoch = state.get
        else:
            last_ts, sess_no, n_events, start_epoch = None, 0, 0, 0

        if state.hasTimedOut:
            # idle user: flush the open session one last time and evict state
            state.remove()
            if last_ts is not None:
                yield pd.DataFrame(
                    [(user_id, sess_no, n_events, start_epoch, last_ts)],
                    columns=[
                        "user_id", "sess_no", "n_events", "start_epoch", "end_epoch"
                    ],
                )
            return

        out_rows = []
        touched: dict[int, list] = {}
        batches = [pdf for pdf in pdfs]
        if batches:
            # one user's rows may span Arrow batches — order globally, once
            allp = pd.concat(batches).sort_values(["tse", "event_id"])
            for tse in allp["tse"].to_numpy():
                t = int(tse)
                if last_ts is None:
                    sess_no, n_events, start_epoch = 1, 1, t
                elif t - last_ts > SESSION_GAP_SEC:
                    touched[sess_no] = [n_events, start_epoch, last_ts]
                    sess_no += 1
                    n_events, start_epoch = 1, t
                else:
                    n_events += 1
                last_ts = t
        if last_ts is not None:
            touched[sess_no] = [n_events, start_epoch, last_ts]
            state.update((last_ts, sess_no, n_events, start_epoch))
            if evict_ms:
                state.setTimeoutDuration(evict_ms)
        for sno, (n, st, en) in touched.items():
            out_rows.append((user_id, sno, n, st, en))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["user_id", "sess_no", "n_events", "start_epoch", "end_epoch"],
            )

    return _session_fn


def dedup_stream(
    df: DataFrame,
    keys: tuple[str, ...] | list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each key, dropping
    later duplicates that land within the watermark
    (``dropDuplicatesWithinWatermark`` — the ingest-time twin of
    ``text_queries.q_dedup_exact``'s hash-groupBy).

    State scale: one state entry per distinct key seen within the
    watermark horizon, evicted as the watermark advances — bounded by the
    key arrival rate × watermark, NOT by corpus size. That bound is the
    honest contract: a duplicate arriving later than the watermark is NOT
    dropped (full-corpus dedup is the batch job's business; this operator
    keeps an ingest pipeline from double-writing bursts and replays).
    """
    return (
        df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tol_sec: int,
    on: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators/interval.py:interval_join`` (inner):
    a native watermarked stream-stream join with a time-range condition —
    Spark bounds both join states by ``watermark + tol`` and evicts as
    event time advances, so state scales with arrival rate, not stream
    length.

    Column contract mirrors the batch operator: the two inputs must have
    disjoint column names. ``on`` adds equality keys — each entry is a
    ``(left_col, right_col)`` pair.

    Spark REQUIRES an equality predicate in stream-stream joins (a pure
    range condition is rejected at planning), and the state store is
    hash-partitioned by the equality keys — so this reuses the batch
    operator's time-bucket trick as that key: the right stream carries
    its tol-width bucket, the left stream explodes into the ±1 candidate
    buckets, and the exact range condition refines. Each pair matches in
    exactly one bucket (the right row has one), so no streaming dedup is
    needed.
    """
    # bucket width floored to 1µs: tol_sec=0 (exact-timestamp match) must
    # not divide by zero — mirrors the batch operator's guard
    tol_us = max(int(tol_sec) * 1_000_000, 1)
    l = left.withColumn(
        left_ts, F.col(left_ts).cast("timestamp")
    ).withWatermark(left_ts, watermark)
    r = right.withColumn(
        right_ts, F.col(right_ts).cast("timestamp")
    ).withWatermark(right_ts, watermark)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(tol_us))
    l = l.withColumn("__lbkt", F.explode(F.array(lb - 1, lb, lb + 1)))
    r = r.withColumn(
        "__rbkt", F.floor(F.unix_micros(F.col(right_ts)) / F.lit(tol_us))
    )
    iv = F.expr(f"INTERVAL {int(tol_sec)} SECOND")
    cond = (
        (F.col("__lbkt") == F.col("__rbkt"))
        & (F.col(right_ts) >= F.col(left_ts) - iv)
        & (F.col(right_ts) <= F.col(left_ts) + iv)
    )
    for pair in on or []:
        lc, rc = pair if isinstance(pair, (tuple, list)) else (pair, pair)
        cond = cond & (F.col(lc) == F.col(rc))
    return l.join(r, cond, "inner").drop("__lbkt", "__rbkt")


def sessionize_stream(events: DataFrame, evict: bool = False) -> DataFrame:
    """Stateful streaming sessionize (streaming twin of ``q_sessionize``).

    Input: a streaming events frame with (user_id, event_id, ts). Output:
    per-session aggregates, updated as triggers fire. A single-trigger
    (availableNow over one backlog) drain is row-identical to the batch
    query; across triggers, re-emitted open sessions upsert by
    (user_id, sess_no).

    ``evict=True`` enables processing-time state eviction (idle users'
    open sessions flush once, then their state is removed — the bound on
    state size for continuous deployments). Left off by default because a
    timeout-armed query never reaches the terminated state under an
    availableNow drain.
    """
    fn = _make_session_fn(10 * SESSION_GAP_SEC * 1000 if evict else 0)
    keyed = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts")).alias("tse"),
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )
