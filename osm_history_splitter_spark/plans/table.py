"""Minimal Iceberg-style versioned table: snapshot manifests over parquet.

The engine's outputs (split extracts, cleaned corpora) need the table
properties the north star names — atomic commits, time travel, safe
resume — without assuming an Iceberg runtime in the container. This is
the standard manifest-pointer design reduced to its core:

- data files live under ``<path>/data/c<id>/`` (one dir per commit
  attempt, never rewritten; ids are independent of versions so a crashed
  attempt never blocks the retry);
- a snapshot manifest ``<path>/_manifests/v<N>.json`` lists the FULL
  file set visible at version N (snapshot isolation: readers of version
  N never see later files);
- the manifest is written to a temp name and atomically renamed — a
  crash mid-commit leaves orphan data files that no manifest references,
  so readers are never exposed to partial writes. A FAILED attempt (an
  exception before the flip) auto-releases its version claim, so the
  retry is just ``commit()`` again; a hard PROCESS crash between claim
  and flip leaves the claim behind, and the operator must call
  ``recover(version)`` before retrying (the claim file alone cannot
  distinguish a dead writer from an in-flight one);
- ``read(version=k)`` time-travels by reading exactly manifest k's file
  list.

At scale the manifest holds file paths + sizes only (KBs per thousand
files); listing never touches the data. On top of the pointer structure
this layer carries the two Iceberg ideas the engine's workloads need:
per-file [min, max] column stats (``stats_cols`` → file pruning on
``read(between=…)``) and EQUALITY DELETES (``strategy='mor'`` merge /
delete commits write only the delta plus a delete-key file; ``read()``
applies each delete to data files older than it — the sequence-number
rule — and ``compact()`` folds the state back into clean files). CDC
commits are therefore O(delta), not O(table). Reference analog: the
reference's writers finalize files at stream end (``cut.hpp:99-117``);
here finalization is the manifest flip.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["VersionedTable", "TableGroup", "ConcurrentCommitError"]


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed this version first (optimistic concurrency:
    re-read the table and retry the commit on top of the new head)."""


def _file_stats(files: list[str], cols: list[str]) -> dict:
    """Per-file [min, max] for the requested columns, read from the
    parquet FOOTERS (row-group statistics — no data pages touched). The
    manifest stays metadata-sized: O(files × cols) scalars. This is the
    Iceberg column-stats idea reduced to the same pointer structure."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        per: dict[str, list] = {}
        for col in cols:
            i = names.get(col)
            if i is None:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break  # a statless row group poisons the file's range
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            # manifest is JSON: only scalar-typed stats are kept (ints,
            # floats, strings cover the clustering keys — z-order, ids,
            # timestamps-as-epoch); exotic types are simply not pruned on
            if lo is not None and isinstance(lo, (int, float, str)):
                per[col] = [lo, hi]
        if per:
            out[f] = per
    return out


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        (self.path / "_manifests").mkdir(parents=True, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(p.stem[1:]) for p in (self.path / "_manifests").glob("v*.json")
        )

    def _manifest(self, version: int) -> dict:
        return json.loads(
            (self.path / "_manifests" / f"v{version}.json").read_text()
        )

    def _empty_frame(self, m: dict) -> DataFrame:
        """Typed empty DataFrame for a snapshot with NO data files —
        schema from this manifest (or the nearest ancestor that has
        one; manifests predating the schema stamp may lack it)."""
        from pyspark.sql.types import StructType

        while m is not None:
            s = m.get("schema")
            if s:
                return self.spark.createDataFrame(
                    [], StructType.fromJson(json.loads(s))
                )
            p = m.get("parent")
            m = self._manifest(p) if p is not None else None
        raise FileNotFoundError(
            f"snapshot at {self.path} has no data files and no stamped "
            "schema (pre-schema-stamp table?): cannot type the empty frame"
        )

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        merge_key: str | list[str] | None = None,
        stats_cols: list[str] | None = None,
        also_delete: DataFrame | None = None,
        strategy: str = "cow",
        txn: tuple[str, int] | None = None,
        cluster_by: str | list[str] | None = None,
        target_files: int | None = None,
    ) -> int:
        """Atomically commit ``df`` as the next version. Modes:

        - ``append``: new snapshot = previous files + the new commit's;
        - ``overwrite``: new snapshot = the new commit's files only;
        - ``merge``: upsert by ``merge_key`` (a column or list of
          columns) — previous rows whose key appears in ``df`` (or in
          ``also_delete``) vanish, ``df``'s rows land;
        - ``delete``: ``df`` carries ONLY the key columns; the new
          snapshot is the previous data minus rows matching any key.

        ``strategy`` (merge/delete only) picks HOW previous rows vanish:

        - ``cow`` (copy-on-write, the default): previous data is read,
          anti-joined, and REWRITTEN into the new commit dir — commits
          cost O(table), reads stay plain scans. Right for full
          republishes and read-heavy tables;
        - ``mor`` (merge-on-read): the commit writes only ``df``'s rows
          plus a small EQUALITY-DELETE key file (the Iceberg idea); the
          snapshot keeps previous files as-is and ``read()`` anti-joins
          the accumulated delete keys against every data file OLDER
          than each delete. Commits cost O(delta) — the shape an
          incremental CDC pipeline needs — at the price of read-side
          anti-joins that grow until :meth:`compact`.

        ``cluster_by`` (column name or list) range-partitions and sorts
        the commit's rows by those columns before writing (into
        ``target_files`` files when given, else the shuffle-partition
        default) — the OPTIMIZE ZORDER idea: each file covers a tight
        [min, max] slice of the clustering key, so the per-file stats
        (``stats_cols`` defaults to the clustering columns) actually
        prune on ``read(between=…)``. For geographic clustering, add a
        ``zorder_expr`` key column first and cluster by it.

        ``txn=(app_id, txn_id)`` stamps the manifest with an application
        transaction (the Delta ``txnAppId``/``txnVersion`` idempotence
        pattern): a writer that may REPLAY work (a Structured Streaming
        ``foreachBatch``, a retried job) checks :meth:`last_txn` first
        and skips batches it already committed — exactly-once sinks on
        top of at-least-once delivery.
        """
        if strategy not in ("cow", "mor"):
            raise ValueError(f"strategy must be cow|mor: {strategy!r}")
        if cluster_by is not None:
            cluster_by = (
                [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
            )
            if stats_cols is None:
                stats_cols = cluster_by  # clustering exists FOR the stats
        vs = self.versions()
        nxt = (vs[-1] + 1) if vs else 1
        # commit-dir ids are decoupled from manifest versions: a crashed
        # commit leaves an orphan dir, and the RETRY must take a fresh
        # dir rather than collide with it (resume = just commit again)
        data_root = self.path / "data"
        used = [
            int(p.name[1:])
            for p in data_root.glob("c*")
            if p.name[1:].isdigit()
        ]
        cdir = data_root / f"c{(max(used) + 1) if used else 1}"
        mor = strategy == "mor" and mode in ("merge", "delete") and vs
        new_deletes: list[tuple[DataFrame, list[str]]] = []
        if mode == "merge":
            if not merge_key:
                raise ValueError("merge mode requires merge_key")
            keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
            if vs and mor:
                del_keys = df.select(*keys).distinct()
                if also_delete is not None:
                    extra_cols = list(also_delete.columns)
                    if extra_cols == keys:
                        # same key shape: one unioned delete file, one
                        # write job instead of two
                        del_keys = del_keys.unionByName(
                            also_delete
                        ).distinct()
                        new_deletes.append((del_keys, keys))
                    else:
                        new_deletes.append((del_keys, keys))
                        new_deletes.append((also_delete.distinct(), extra_cols))
                else:
                    new_deletes.append((del_keys, keys))
            elif vs:
                prev = self.read()
                keep = prev.join(
                    df.select(*keys).distinct(), keys, "left_anti"
                )
                if also_delete is not None:
                    # delete-and-upsert in ONE atomic snapshot: rows
                    # matching these keys vanish even when ``df`` carries
                    # no replacement (an id that lost membership)
                    keep = keep.join(
                        also_delete.distinct(),
                        list(also_delete.columns),
                        "left_anti",
                    )
                df = keep.unionByName(df)
            mode_files = "mor" if mor else "self"
        elif mode == "delete":
            if not merge_key:
                raise ValueError("delete mode requires merge_key")
            if not vs:
                raise FileNotFoundError("delete on an empty table")
            keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
            if mor:
                new_deletes.append((df.select(*keys).distinct(), keys))
                df = None  # nothing appended; the commit is keys-only
                mode_files = "mor"
            else:
                df = self.read().join(
                    df.select(*keys).distinct(), keys, "left_anti"
                )
                mode_files = "self"
        elif mode in ("append", "overwrite"):
            mode_files = mode
        else:
            raise ValueError(
                f"mode must be append|overwrite|merge|delete: {mode!r}"
            )

        # optimistic concurrency: claim the version number with an O_EXCL
        # create BEFORE doing any work — the loser of a race fails here
        # with nothing written, instead of silently renaming over the
        # winner's manifest at the end
        claim = self.path / "_manifests" / f"v{nxt}.json.claim"
        try:
            os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {nxt} already claimed at {self.path}"
            ) from None

        final = self.path / "_manifests" / f"v{nxt}.json"
        try:
            if df is not None:
                if cluster_by is not None:
                    n = target_files or df.sparkSession.conf.get(
                        "spark.sql.shuffle.partitions"
                    )
                    df = df.repartitionByRange(
                        int(n), *cluster_by
                    ).sortWithinPartitions(*cluster_by)
                df.write.mode("errorifexists").parquet(str(cdir))
            files = sorted(
                str(f) for f in cdir.glob("*.parquet") if f.stat().st_size > 0
            ) if df is not None else []
            stats = _file_stats(files, stats_cols) if stats_cols else {}
            added = {f: nxt for f in files}
            delete_entries: list[dict] = []
            for i, (keys_df, key_cols) in enumerate(new_deletes):
                ddir = cdir / f"_deletes_{i}"
                keys_df.write.mode("errorifexists").parquet(str(ddir))
                dfiles = sorted(
                    str(f)
                    for f in ddir.glob("*.parquet")
                    if f.stat().st_size > 0
                )
                if dfiles:
                    delete_entries.append(
                        {"files": dfiles, "keys": key_cols, "seq": nxt}
                    )
            if mode_files in ("append", "mor") and vs:
                prev = self._manifest(vs[-1])
                files = prev["files"] + files
                # stats carry over file-by-file across snapshots; so do
                # per-file add-sequences and accumulated delete entries
                # (files in manifests that predate "added" default to
                # seq 0 — older than every delete, which is correct)
                stats = {**prev.get("stats", {}), **stats}
                added = {**prev.get("added", {}), **added}
                delete_entries = prev.get("deletes", []) + delete_entries
            manifest = {
                "version": nxt,
                "parent": vs[-1] if vs else None,
                "mode": mode,
                "files": files,
                "bytes": sum(os.path.getsize(f) for f in files),
                "committed_at": time.time(),
            }
            # schema rides in the manifest so an all-empty snapshot
            # (zero parquet files — Spark writes none for an empty
            # frame) still reads back as a typed empty DataFrame
            if df is not None:
                manifest["schema"] = df.schema.json()
            elif vs:
                prev_schema = self._manifest(vs[-1]).get("schema")
                if prev_schema:
                    manifest["schema"] = prev_schema
            if txn is not None:
                manifest["txn"] = {"app": str(txn[0]), "id": int(txn[1])}
            if stats:
                manifest["stats"] = stats
            if delete_entries:
                manifest["deletes"] = delete_entries
                manifest["added"] = added
            tmp = self.path / "_manifests" / f".v{nxt}.json.tmp"
            tmp.write_text(json.dumps(manifest, indent=1))
            if final.exists():  # unreachable while claims persist
                raise ConcurrentCommitError(f"{final} already committed")
            os.rename(tmp, final)  # atomic flip
        except BaseException:
            # this ATTEMPT failed before the manifest flip (a transient
            # Spark write error, for instance): release our own claim so
            # the caller's retry is not wedged behind it. The orphan data
            # dir stays — unreferenced by any manifest, invisible to
            # readers. Only a hard crash (process death between claim and
            # flip) still needs an explicit recover(version).
            if not final.exists():
                claim.unlink(missing_ok=True)
            raise
        # the claim is NEVER unlinked on success: it is the permanent
        # record that this version number was taken. Releasing it would
        # let a writer holding a stale versions() snapshot re-claim the
        # number and rename over the committed manifest (silent lineage
        # loss). recover() only removes claims whose manifest is missing.
        return nxt

    def recover(self, version: int) -> bool:
        """Release a stale claim left by a committer that crashed between
        claiming ``version`` and flipping its manifest. Returns True if a
        claim was removed. Deliberately explicit (an operator/driver
        decision, like Iceberg's orphan cleanup): the claim file alone
        cannot distinguish a crashed writer from an in-flight one."""
        if (self.path / "_manifests" / f"v{version}.json").exists():
            return False  # committed — nothing to recover
        claim = self.path / "_manifests" / f"v{version}.json.claim"
        if claim.exists():
            claim.unlink()
            return True
        return False

    # -- reads -------------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        between: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """Snapshot read; ``between=(col, lo, hi)`` additionally SKIPS
        every file whose manifest [min, max] for ``col`` cannot intersect
        [lo, hi] (files without stats are conservatively kept) and
        applies the exact filter on what remains. With a z-ordered or
        range-partitioned write layout this is real file pruning — the
        scan list shrinks before Spark ever opens a footer.

        Snapshots carrying equality deletes (``strategy='mor'`` commits)
        apply them here: data files are grouped by the commit that added
        them and each group is anti-joined against every delete NEWER
        than it (a delete never touches rows committed after it — the
        same sequence-number rule as Iceberg's equality deletes). Delete
        key sets sharing a key shape are unioned so each group pays one
        anti-join per shape, not per commit."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        v = version if version is not None else vs[-1]
        if v not in vs:
            raise FileNotFoundError(f"version {v} not in {vs}")
        m = self._manifest(v)
        files = m["files"]
        deletes = m.get("deletes", [])
        if between is None:
            kept = files
        else:
            col, lo, hi = between
            stats = m.get("stats", {})
            kept = [
                f
                for f in files
                if (rng := stats.get(f, {}).get(col)) is None
                or (rng[0] <= hi and rng[1] >= lo)
            ]
        from pyspark.sql import functions as F

        if not kept:
            if files:
                # empty result with the snapshot's schema (read one
                # file's schema, filter to nothing)
                out = self.spark.read.parquet(files[0]).filter(
                    F.lit(False)
                )
            else:
                # zero data files in the whole snapshot (an empty
                # commit): rebuild the typed empty frame from the
                # schema stamped into the manifest chain
                out = self._empty_frame(m)
        elif not deletes:
            out = self.spark.read.parquet(*kept)
        else:
            added = m.get("added", {})
            by_seq: dict[int, list[str]] = {}
            for f in kept:
                by_seq.setdefault(added.get(f, 0), []).append(f)
            parts = []
            for seq in sorted(by_seq):
                part = self.spark.read.parquet(*by_seq[seq])
                # union delete key sets per key shape before joining —
                # one anti-join per shape per group
                by_shape: dict[tuple, list[str]] = {}
                for d in deletes:
                    if d["seq"] > seq:
                        by_shape.setdefault(
                            tuple(d["keys"]), []
                        ).extend(d["files"])
                for shape, dfiles in by_shape.items():
                    keys_df = self.spark.read.parquet(*dfiles).distinct()
                    part = part.join(keys_df, list(shape), "left_anti")
                parts.append(part)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        if between is None:
            return out
        col, lo, hi = between
        return out.filter(F.col(col).between(F.lit(lo), F.lit(hi)))

    def pruned_files(
        self, between: tuple[str, object, object], version: int | None = None
    ) -> tuple[int, int]:
        """(kept, total) file counts for a range — observability for the
        pruning decision (tests and operators)."""
        vs = self.versions()
        v = version if version is not None else vs[-1]
        m = self._manifest(v)
        col, lo, hi = between
        stats = m.get("stats", {})
        kept = [
            f
            for f in m["files"]
            if (rng := stats.get(f, {}).get(col)) is None
            or (rng[0] <= hi and rng[1] >= lo)
        ]
        return len(kept), len(m["files"])

    def history(self) -> list[dict]:
        """Commit log, oldest first: version, parent, mode, file/byte
        counts, delete-entry count, commit time — manifest metadata only
        (no data touched)."""
        out = []
        for v in self.versions():
            m = self._manifest(v)
            out.append(
                {
                    "version": v,
                    "parent": m.get("parent"),
                    "mode": m.get("mode"),
                    "files": len(m.get("files", [])),
                    "bytes": m.get("bytes"),
                    "deletes": len(m.get("deletes", [])),
                    "committed_at": m.get("committed_at"),
                }
            )
        return out

    def changes(self, since: int, until: int | None = None) -> DataFrame:
        """Change data feed between two snapshots (the Delta
        ``table_changes`` idea): one DataFrame of the rows each commit in
        ``(since, until]`` ADDED, with ``_change_version`` and
        ``_change_type`` ('insert') columns. A downstream consumer that
        also needs the deleted keys reads them per version with
        :meth:`deleted_keys` (they carry only key columns, so the two
        feeds cannot share one schema).

        Works for every commit mode: appended/merged rows are exactly the
        files first referenced by that version's manifest; an overwrite
        (or compact) re-adds its whole snapshot. At scale this reads only
        the NEW files of each commit — the O(delta) read that makes a
        downstream incremental consumer (an index builder, an extract
        refresher) possible without diffing snapshots."""
        from pyspark.sql import functions as F

        vs = self.versions()
        if not vs:
            raise FileNotFoundError(
                f"no committed version at {self.path}"
            )
        if since not in vs and since != 0:
            raise FileNotFoundError(f"version {since} not in {vs}")
        if until is not None and until not in vs:
            raise FileNotFoundError(f"version {until} not in {vs}")
        until = until if until is not None else vs[-1]
        parts = []
        prev_files: set[str] = set(
            self._manifest(since)["files"]
        ) if since in vs else set()
        for v in vs:
            if v <= since or v > until:
                continue
            files = self._manifest(v)["files"]
            new = [f for f in files if f not in prev_files]
            prev_files = set(files)
            if not new:
                continue
            parts.append(
                self.spark.read.parquet(*new).select(
                    "*",
                    F.lit(v).alias("_change_version"),
                    F.lit("insert").alias("_change_type"),
                )
            )
        if not parts:
            # empty feed with the head snapshot's schema + change columns
            head = self.read(version=until).limit(0)
            return head.select(
                "*",
                F.lit(0).alias("_change_version"),
                F.lit("insert").alias("_change_type"),
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def last_txn(self, app: str) -> int | None:
        """Highest transaction id ``app`` has committed (None if never) —
        manifest metadata only, newest first. The check half of the
        ``txn=`` idempotence contract on :meth:`commit`."""
        for v in reversed(self.versions()):
            t = self._manifest(v).get("txn")
            if t and t.get("app") == app:
                return int(t["id"])
        return None

    def stream_changes(self, starting_version: int = 0) -> DataFrame:
        """Streaming twin of :meth:`changes`: a Structured Streaming
        DataFrame that follows this table's commits live (offsets are
        snapshot versions; see ``streaming/table_feed.py``)."""
        from ..streaming.table_feed import stream_changes

        return stream_changes(self.spark, str(self.path), starting_version)

    def deleted_keys(self, version: int) -> DataFrame | None:
        """Equality-delete keys a merge-on-read commit recorded at
        ``version`` (None if that commit carries none): the delete half
        of the change feed."""
        m = self._manifest(version)
        files = [
            f
            for d in m.get("deletes", [])
            if d["seq"] == version
            for f in d["files"]
        ]
        if not files:
            return None
        return self.spark.read.parquet(*files).distinct()

    def compact(
        self,
        stats_cols: list[str] | None = None,
        cluster_by: str | list[str] | None = None,
        target_files: int | None = None,
    ) -> int:
        """Fold accumulated merge-on-read state into a clean snapshot:
        one overwrite commit of the current resolved view. Read cost
        returns to a plain scan; older MOR snapshots stay
        time-travelable (their delete files remain referenced by their
        manifests, so vacuum keeps them). With ``cluster_by`` this is the
        full OPTIMIZE ZORDER maintenance op: fold + re-cluster + tight
        per-file stats in one atomic commit."""
        return self.commit(
            self.read(),
            mode="overwrite",
            stats_cols=stats_cols,
            cluster_by=cluster_by,
            target_files=target_files,
        )

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO manifest (orphans from
        crashed commit attempts) and remove emptied commit dirs. Returns
        the deleted paths.

        Refuses to run while any claim has no manifest: that is exactly
        the window where a live writer may still be producing files that
        a future manifest will reference (the claim is created BEFORE
        the data write starts, so every in-flight commit dir is guarded
        by a claim). Resolve with ``recover(version)`` if the writer is
        known dead, then vacuum. With no pending claims the operation is
        safe by construction: readers resolve files only through
        immutable manifests, so an unreferenced file can never become
        referenced again."""
        pending = [
            p.name
            for p in (self.path / "_manifests").glob("v*.json.claim")
            if not (self.path / "_manifests" / p.name[: -len(".claim")]).exists()
        ]
        if pending:
            raise RuntimeError(
                f"vacuum refused: unresolved claims {pending} — a commit "
                "may be in flight; recover() the version(s) if the writer "
                "is dead, then retry"
            )
        referenced: set[str] = set()
        for v in self.versions():
            m = self._manifest(v)
            referenced.update(m["files"])
            for d in m.get("deletes", []):
                referenced.update(d["files"])
        deleted: list[str] = []
        data_root = self.path / "data"
        if not data_root.exists():
            return deleted
        for cdir in sorted(data_root.glob("c*")):
            has_live = any(
                str(f) in referenced for f in cdir.rglob("*.parquet")
            )
            for f in sorted(cdir.rglob("*")):
                if not f.is_file() or str(f) in referenced:
                    continue
                # keep Spark bookkeeping (_SUCCESS, .crc) next to live
                # data; it goes only when the whole commit dir is orphaned
                if has_live and f.name.startswith(("_", ".")):
                    continue
                f.unlink()
                deleted.append(str(f))
            # prune emptied SUBdirectories (e.g. a crashed MOR commit's
            # _deletes_N/) deepest-first, else the cdir rmdir below
            # never fires and orphaned commit dirs accumulate forever
            for d in sorted(
                (d for d in cdir.rglob("*") if d.is_dir()),
                key=lambda d: len(d.parts),
                reverse=True,
            ):
                if not any(d.iterdir()):
                    d.rmdir()
            if not any(cdir.iterdir()):
                cdir.rmdir()
        return deleted


class TableGroup:
    """Snapshot-consistent SET of VersionedTables under one root — the
    multi-table transaction neither Iceberg nor Delta gives you.

    A split publishes three entity tables; their per-table commits are
    atomic individually, but a crash (or a reader racing the writer)
    between the nodes commit and the ways commit exposes a MIXED state:
    nodes from the new dump joined against ways from the old one. The
    group closes that window with one more level of the same manifest
    trick: after every member table committed, ``pin`` writes
    ``<root>/_group/g<N>.json`` mapping member name → table version and
    atomically renames it into place. Group readers resolve member
    versions through the latest pin and NEVER see a half-published set —
    a crash before the pin leaves the previous pin (and its fully
    consistent member versions) in force, and the retry's re-commits
    land as newer, unpinned table versions. Pins are immutable, so group
    reads time-travel consistently (``group_version=…`` pins all members
    at once, unlike per-table ``version=`` which can't know that tables
    advance at different rates — an unchanged entity skips commits
    entirely).

    Metadata-only: a pin is one tiny JSON rename; no data is read or
    written. Claims give writers the same optimistic concurrency as
    table commits.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        # no mkdir here: readers must work off a read-only mount of the
        # published dir — pin() (the only writer) creates the dir

    def versions(self) -> list[int]:
        gdir = self.path / "_group"
        if not gdir.is_dir():
            return []
        return sorted(int(p.stem[1:]) for p in gdir.glob("g*.json"))

    def pin(self, members: dict[str, int]) -> int:
        """Atomically record ``{table name: table version}`` as the next
        consistent group snapshot. Call AFTER every member commit landed."""
        (self.path / "_group").mkdir(parents=True, exist_ok=True)
        vs = self.versions()
        nxt = (vs[-1] + 1) if vs else 1
        claim = self.path / "_group" / f"g{nxt}.json.claim"
        try:
            os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            raise ConcurrentCommitError(
                f"group version {nxt} already claimed at {self.path}"
            ) from None
        final = self.path / "_group" / f"g{nxt}.json"
        try:
            tmp = self.path / "_group" / f".g{nxt}.json.tmp"
            tmp.write_text(
                json.dumps(
                    {
                        "version": nxt,
                        "members": {k: int(v) for k, v in members.items()},
                        "committed_at": time.time(),
                    },
                    indent=1,
                )
            )
            os.rename(tmp, final)  # atomic flip, claim kept as the record
        except BaseException:
            # same contract as VersionedTable.commit: a failed ATTEMPT
            # (bad members dict, full disk) releases its own claim so the
            # retry isn't wedged; only a hard crash between claim and
            # flip needs the explicit recover()
            if not final.exists():
                claim.unlink(missing_ok=True)
            raise
        return nxt

    def recover(self, version: int) -> bool:
        """Release a stale pin claim left by a writer that crashed between
        claiming ``version`` and flipping its manifest (mirror of
        ``VersionedTable.recover``)."""
        if (self.path / "_group" / f"g{version}.json").exists():
            return False
        claim = self.path / "_group" / f"g{version}.json.claim"
        if claim.exists():
            claim.unlink()
            return True
        return False

    def members(self, group_version: int | None = None) -> dict[str, int]:
        """The pinned member→version map (latest pin by default)."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no group pin at {self.path}")
        v = group_version if group_version is not None else vs[-1]
        if v not in vs:
            raise FileNotFoundError(f"group version {v} not in {vs}")
        m = json.loads((self.path / "_group" / f"g{v}.json").read_text())
        return {k: int(x) for k, x in m["members"].items()}

    def table(self, name: str) -> VersionedTable:
        return VersionedTable(self.spark, str(self.path / name))

    def read(
        self,
        name: str,
        group_version: int | None = None,
        between: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """Member read pinned to a consistent group snapshot (stats
        pruning via ``between`` passes straight through)."""
        return self.table(name).read(
            version=self.members(group_version)[name], between=between
        )
