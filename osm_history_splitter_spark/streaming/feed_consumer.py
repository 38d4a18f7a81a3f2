"""Derived-table maintenance from the streaming change feed.

``follow_into`` closes the CDC loop the table layer opened: a source
:class:`~..plans.table.VersionedTable` streams its commits
(``table_feed.py``), a per-batch transform derives rows, and the result
is MERGED into a target ``VersionedTable`` — the bronze→silver hop of a
medallion pipeline, maintained incrementally instead of recomputed per
snapshot. The reference's consumers re-read whole extract files per dump
(``tools/fetch-and-split.php``); here a downstream index/aggregate
follows the table at O(delta) per commit.

Exactly-once without a transactional sink: Structured Streaming's
``foreachBatch`` is AT-LEAST-once (a batch replays after a crash between
sink write and offset-log commit). The target table turns that into
exactly-once with the Delta ``txnAppId`` pattern — every commit is
stamped ``txn=(app_id, batch_id)`` and a replayed batch is skipped when
``target.last_txn(app_id) >= batch_id``. The stamp and the data land in
ONE atomic manifest flip, so there is no window where the data committed
but the stamp didn't.

Scale posture: each micro-batch touches only the files its source
commits added (the feed source plans manifest diffs); the derive runs as
a normal batch DataFrame job; the target commit is merge-on-read —
O(batch) writes, compaction deferred to the table's own ``compact()``.
Deletes: the feed carries inserts only (delete KEYS can't share the row
schema); a consumer whose derivation must react to source deletes reads
``source.deleted_keys(v)`` for the batch's ``_change_version`` range
inside ``transform`` and returns the keys to drop via the merge's
``also_delete`` — or simply re-derives affected groups, which plain
upsert-by-key already handles.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..plans.table import VersionedTable

__all__ = ["follow_into"]


def follow_into(
    source: VersionedTable,
    target: VersionedTable,
    transform: Callable[[DataFrame], DataFrame],
    merge_key: str | list[str],
    checkpoint_dir: str,
    app_id: str | None = None,
    starting_version: int = 0,
    strategy: str = "mor",
):
    """Start (and return) a streaming query that keeps ``target`` derived
    from ``source``'s change feed: for each micro-batch of newly
    committed rows, ``transform(batch)`` is upserted into ``target`` by
    ``merge_key`` (first batch bootstraps with an append). The returned
    query is live — drive it with ``processAllAvailable()`` /
    ``awaitTermination()`` and ``stop()``. The source must already carry
    its first commit (the feed's row schema comes from its head
    snapshot).

    Restart-safe end to end: offsets live in ``checkpoint_dir``, replayed
    batches are skipped via the ``txn`` stamp, and both sides of the hop
    re-plan deterministically from immutable manifests.

    The txn stamp and the checkpoint live and die TOGETHER: batch ids
    are checkpoint-relative, so ``app_id`` defaults to a digest of the
    (resolved) checkpoint path — two streams feeding one target then
    stamp under different apps instead of silently skipping each other's
    batches. Corollary: deleting ``checkpoint_dir`` but keeping the
    target resets batch ids UNDER THE SAME app and the old stamp would
    silently skip everything — on a checkpoint reset, reset (or re-name)
    the app by passing a fresh explicit ``app_id``.
    """
    if app_id is None:
        import hashlib
        from pathlib import Path

        digest = hashlib.md5(
            str(Path(checkpoint_dir).resolve()).encode()
        ).hexdigest()[:12]
        app_id = f"follow_into-{digest}"

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # delete-only / no-op source commit
        last = target.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch — already in a committed manifest
        target.commit(
            transform(batch),
            mode="merge",  # on an empty target this is a plain first write
            merge_key=merge_key,
            strategy=strategy,
            txn=(app_id, batch_id),
        )

    return (
        source.stream_changes(starting_version=starting_version)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
