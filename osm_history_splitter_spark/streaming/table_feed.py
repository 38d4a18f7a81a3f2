"""Streaming change-data-feed over :class:`~..plans.table.VersionedTable`.

The batch half of the CDF is ``VersionedTable.changes(since, until)``; this
module is the streaming half — a Structured Streaming SOURCE whose offsets
are the table's snapshot versions, built on Spark 4's Python DataSource API
(``pyspark.sql.datasource``). A downstream incremental consumer
(an index builder, an extract refresher, the fetch service's next hop)
subscribes with ``readStream`` and receives exactly the rows each commit
added, tagged ``_change_version`` / ``_change_type`` — the Delta-CDF
``readChangeFeed`` idea re-expressed over this repo's manifest structure.

Why a custom source and not the built-in file stream: a file stream over
``<path>/data/*/`` would surface parquet files the moment the WRITE lands,
before (or without) the manifest flip — breaking the table's snapshot
isolation (orphans from crashed attempts would stream as phantom rows).
Offsets-as-versions read only manifest-referenced files, so the stream
sees precisely the committed history, in commit order.

Exactly-once: manifests are immutable and version-ordered, so re-planning
a batch between two checkpointed offsets always yields the same files —
the determinism Structured Streaming's offset log needs for replay.

Scale posture: this is the partition-based ``DataSourceStreamReader``,
not the driver-side Simple reader — each file a commit added becomes one
``InputPartition`` and is decoded executor-side into Arrow record batches
(vectorized, never row-at-a-time Python). Driver work per micro-batch is
manifest-JSON diffing only (KBs). Commit modes map exactly as in the
batch feed: append/merge stream their new files, an overwrite (or
``compact()``) re-adds its whole snapshot, a merge-on-read delete-only
commit advances the offset with zero rows (its delete KEYS are readable
batch-side via ``deleted_keys(version)`` — key-only rows cannot share the
feed's row schema).

Reference analog: the reference has no change feed at all — a new dump
means re-reading the planet (``tools/fetch-and-split.php``); this is the
piece that lets consumers follow the table without snapshot diffs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableChangeFeedSource", "stream_changes"]

_CHANGE_COLS = (
    StructField("_change_version", LongType(), False),
    StructField("_change_type", StringType(), False),
)


def _versions(path: Path) -> list[int]:
    return sorted(
        int(p.stem[1:]) for p in (path / "_manifests").glob("v*.json")
    )


def _manifest(path: Path, version: int) -> dict:
    return json.loads((path / "_manifests" / f"v{version}.json").read_text())


def _new_files(path: Path, since: int, until: int) -> Iterator[tuple[int, str]]:
    """(version, file) pairs for every file FIRST referenced by a manifest
    in ``(since, until]`` — the same diff rule as the batch ``changes()``
    (manifest metadata only; no data touched)."""
    vs = _versions(path)
    prev: set[str] = set(_manifest(path, since)["files"]) if since in vs else set()
    for v in vs:
        if v <= since or v > until:
            continue
        files = _manifest(path, v)["files"]
        for f in files:
            if f not in prev:
                yield v, f
        prev = set(files)


def _arrow_spark_safe(t):
    """Normalize an arrow type to one Spark's Arrow bridge accepts:
    nanosecond timestamps (INT96 parquet, the Spark writer default) drop
    to microseconds, recursively through nested types."""
    import pyarrow as pa

    if pa.types.is_timestamp(t) and t.unit == "ns":
        return pa.timestamp("us", t.tz)
    if pa.types.is_list(t):
        return pa.list_(_arrow_spark_safe(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(
            _arrow_spark_safe(t.key_type), _arrow_spark_safe(t.item_type)
        )
    if pa.types.is_struct(t):
        return pa.struct(
            [
                pa.field(f.name, _arrow_spark_safe(f.type), f.nullable)
                for f in t
            ]
        )
    return t


class _ChangeFilePartition(InputPartition):
    def __init__(self, file: str, version: int):
        self.file = file
        self.version = version


class _TableChangeFeedReader(DataSourceStreamReader):
    def __init__(self, path: str, start: int, schema: StructType):
        self._path = Path(path)
        vs = _versions(self._path)
        if start != 0 and start not in vs:
            # same contract as the batch changes(): an unknown since
            # must fail loudly, not silently replay the next snapshot's
            # EVERY file as inserts (duplicate rows downstream)
            raise FileNotFoundError(
                f"startingVersion {start} not in {vs} at {self._path}"
            )
        self._start = start
        self._base_fields = [
            f for f in schema.fields
            if f.name not in ("_change_version", "_change_type")
        ]
        self._base_cols = [f.name for f in self._base_fields]

    # -- offsets (dicts; Spark JSON-logs them for replay) ------------------

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        vs = _versions(self._path)
        return {"version": max(vs[-1], self._start) if vs else self._start}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [
            _ChangeFilePartition(f, v)
            for v, f in _new_files(
                self._path, int(start["version"]), int(end["version"])
            )
        ]

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to release

    # -- executor-side decode (Arrow batches, vectorized) ------------------

    def read(self, partition: _ChangeFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        pf = pq.ParquetFile(partition.file)
        for batch in pf.iter_batches():
            n = batch.num_rows
            present = set(batch.schema.names)
            arrays = []
            for f in self._base_fields:
                if f.name in present:
                    col = batch.column(f.name)
                    safe = _arrow_spark_safe(col.type)
                    arrays.append(col if col.type == safe else col.cast(safe))
                else:
                    # schema evolution: a column added AFTER this file's
                    # commit reads back as typed nulls (the batch
                    # changes() path gets this from per-version parquet
                    # reads; the stream decodes against the head schema)
                    arrays.append(
                        pa.nulls(
                            n,
                            type=_arrow_spark_safe(to_arrow_type(f.dataType)),
                        )
                    )
            arrays.append(pa.repeat(pa.scalar(partition.version, pa.int64()), n))
            arrays.append(pa.repeat(pa.scalar("insert", pa.string()), n))
            yield pa.RecordBatch.from_arrays(
                arrays, self._base_cols + ["_change_version", "_change_type"]
            )


class TableChangeFeedSource(DataSource):
    """``spark.readStream.format("table_changes").option("path", …)`` —
    register with ``spark.dataSource.register(TableChangeFeedSource)`` or
    use the :func:`stream_changes` helper. Options:

    - ``path`` (required): the VersionedTable root;
    - ``startingVersion`` (default 0): stream commits AFTER this version
      (0 = the full history, matching ``changes(0)``).
    """

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def _path(self) -> Path:
        path = self.options.get("path")
        if not path:
            raise ValueError("table_changes requires .option('path', …)")
        return Path(path)

    def schema(self) -> StructType:
        """Head-snapshot row schema + the two change columns, read from
        one parquet FOOTER (driver-side, no data pages, no session)."""
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self._path()
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed version at {path}")
        files = _manifest(path, vs[-1])["files"]
        if not files:
            raise FileNotFoundError(
                f"head snapshot v{vs[-1]} at {path} references no data "
                "files — the feed's row schema is undefined"
            )
        # the manifest-stamped schema is authoritative (a head FILE may
        # predate a column added by a later commit — append snapshots
        # keep old files first); footer inference is the fallback for
        # tables committed before the schema stamp existed
        stamped = _manifest(path, vs[-1]).get("schema")
        if stamped:
            base = StructType.fromJson(json.loads(stamped))
            return StructType(list(base.fields) + list(_CHANGE_COLS))
        import pyarrow as pa

        raw = pq.read_schema(files[0])
        safe = pa.schema(
            [
                pa.field(f.name, _arrow_spark_safe(f.type), f.nullable)
                for f in raw
            ]
        )
        base = from_arrow_schema(safe)
        return StructType(list(base.fields) + list(_CHANGE_COLS))

    def streamReader(self, schema: StructType) -> _TableChangeFeedReader:
        start = self.options.get(
            "startingversion", self.options.get("startingVersion", 0)
        )
        return _TableChangeFeedReader(str(self._path()), int(start), schema)


def stream_changes(
    spark: "SparkSession", path: str, starting_version: int = 0
) -> "DataFrame":
    """Streaming DataFrame of the table's change feed — one row per row
    each commit after ``starting_version`` added, in commit order, with
    ``_change_version`` / ``_change_type`` columns (the streaming twin of
    ``VersionedTable.changes``). The table must already carry at least
    one commit referencing data files: the feed's row schema is read
    from the head snapshot at ``load()`` time (raises, rather than
    idling, on an empty table — start consumers after the first
    publish)."""
    if starting_version != 0:
        vs = _versions(Path(path))
        if starting_version not in vs:
            raise FileNotFoundError(
                f"startingVersion {starting_version} not in {vs} at {path}"
            )
    spark.dataSource.register(TableChangeFeedSource)
    return (
        spark.readStream.format("table_changes")
        .option("path", path)
        .option("startingVersion", starting_version)
        .load()
    )
