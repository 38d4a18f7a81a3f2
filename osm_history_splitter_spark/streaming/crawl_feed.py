"""Streaming WARC ingestion — a Structured Streaming SOURCE over a crawl
drop directory (``sources/warc.py`` containers), the continuous twin of
the batch ``read_warc``/``read_wet`` readers.

This is the crawl-side analog of the reference's fetch loop
(``tools/fetch-and-split.php``: poll for the newest dump, process it):
a fetcher keeps appending ``*.warc.gz``/``*.wet.gz`` files to a
directory; downstream subscribes with ``readStream`` and receives each
file's records exactly once, in file order — feeding the streaming
split (``streaming/hardcut_stream.py``) or a bronze VersionedTable via
``follow_into``.

Offset contract: files are consumed in LEXICOGRAPHIC name order and the
offset is the last consumed filename. Producers must therefore name
files monotonically — ``write_warc(prefix=f"b{n:06d}-")`` per tick does
exactly that (the Common Crawl segment convention: segment paths sort
by crawl time). A file that appears with a name ≤ the committed offset
is ignored by construction — the documented trade for offsets that are
a single string, deterministic on replay, with no seen-set state. (The
built-in file stream keeps a driver-side seen-map instead; offsets-as-
names keeps replay purely a function of the checkpoint, matching the
``table_feed`` design.)

Scale posture: partition planning is driver-side filename + ``.idx``
sidecar listing only (KBs); each InputPartition is a byte range of one
file (index-aligned member runs via ``_read_tasks`` granularity) and
is inflated + parsed executor-side into Arrow record batches. A 1000-
file tick fans out to ≥1000 partitions with zero driver decode work.

Why the offset is not "directory mtime" or a seen-set: Structured
Streaming replays ``partitions(start, end)`` from the offset log after
a crash; only a pure function of (start, end) → files is exactly-once.

Visibility contract: ``write_warc`` publishes atomically (data streams
into a ``*.tmp`` name the globs here never match, the idx sidecar lands
first, ``os.replace`` flips the final name last), so a file listed by
``latestOffset`` is always complete — a producer mid-write can never be
half-read or skipped. Defense in depth: ``iter_members`` raises on a
truncated gzip member (a non-atomic foreign producer fails the batch
loudly instead of committing past silently-dropped records).
"""

from __future__ import annotations

from pathlib import Path
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["CrawlFeedSource", "stream_crawl"]

_SCHEMAS = {
    "warc": StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
        ]
    ),
    "wet": StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    ),
}
_PATTERNS = {"warc": "*.warc.gz", "wet": "*.wet.gz"}
#: offset value for "nothing consumed yet" — sorts before every filename
_EPOCH = ""


class _CrawlRangePartition(InputPartition):
    def __init__(self, file: str, off: int, length: int, kind: str):
        self.file = file
        self.off = off
        self.length = length
        self.kind = kind


class _CrawlFeedReader(DataSourceStreamReader):
    def __init__(self, path: str, kind: str):
        self._path = path
        self._kind = kind

    def initialOffset(self) -> dict:
        return {"file": _EPOCH}

    def latestOffset(self) -> dict:
        names = sorted(
            p.name
            for p in Path(self._path).glob(_PATTERNS[self._kind])
        )
        return {"file": names[-1] if names else _EPOCH}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from ..sources.warc import _read_tasks

        lo, hi = start["file"], end["file"]
        return [
            _CrawlRangePartition(f, off, length, self._kind)
            for f, off, length in _read_tasks(
                self._path, _PATTERNS[self._kind]
            )
            if lo < Path(f).name <= hi
        ]

    def commit(self, end: dict) -> None:
        pass  # files are immutable once named; nothing to release

    def read(self, partition: _CrawlRangePartition):
        import pyarrow as pa

        from ..sources.warc import (
            _parse_http,
            _ts_parse,
            iter_members,
            parse_records,
        )

        with open(partition.file, "rb") as fh:
            fh.seek(partition.off)
            raw = fh.read(partition.length)
        plain = b"".join(iter_members(raw))
        urls: list[str] = []
        tss: list = []
        p3: list = []
        p4: list = []
        for headers, payload in parse_records(plain):
            t = headers.get("warc-type")
            if partition.kind == "warc" and t == "response":
                urls.append(headers["warc-target-uri"])
                tss.append(_ts_parse(headers["warc-date"]))
                p3.append(_parse_http(payload))
            elif partition.kind == "wet" and t == "conversion":
                urls.append(headers["warc-target-uri"])
                tss.append(_ts_parse(headers["warc-date"]))
                p3.append(payload.decode("utf-8"))
                p4.append(
                    headers.get("warc-identified-content-language", "")
                )
        if not urls:
            return
        arrays = [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(p3, pa.binary() if partition.kind == "warc" else pa.string()),
        ]
        names = list(_SCHEMAS[partition.kind].fieldNames())
        if partition.kind == "wet":
            arrays.append(pa.array(p4, pa.string()))
        yield pa.RecordBatch.from_arrays(arrays, names)


class CrawlFeedSource(DataSource):
    """``spark.readStream.format("crawl_feed").option("path", …)`` —
    register with ``spark.dataSource.register(CrawlFeedSource)`` or use
    the :func:`stream_crawl` helper. Options:

    - ``path`` (required): the crawl drop directory;
    - ``kind`` (default ``warc``): ``warc`` → (url, warc_ts, html);
      ``wet`` → (url, warc_ts, text, lang).
    """

    @classmethod
    def name(cls) -> str:
        return "crawl_feed"

    def _kind(self) -> str:
        kind = self.options.get("kind", "warc")
        if kind not in _SCHEMAS:
            raise ValueError(f"kind must be warc|wet, got {kind!r}")
        return kind

    def schema(self) -> StructType:
        return _SCHEMAS[self._kind()]

    def streamReader(self, schema: StructType) -> _CrawlFeedReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("crawl_feed requires .option('path', …)")
        return _CrawlFeedReader(path, self._kind())


def stream_crawl(
    spark: "SparkSession", path: str, kind: str = "warc"
) -> "DataFrame":
    """Streaming DataFrame over a WARC/WET drop directory — each
    monotonically-named file's records appear exactly once, in file
    order (offsets = filenames; see the module docstring contract)."""
    spark.dataSource.register(CrawlFeedSource)
    return (
        spark.readStream.format("crawl_feed")
        .option("path", path)
        .option("kind", kind)
        .load()
    )
