"""WARC / WET container source + sink for the Common-Crawl-style pages
table ``(url, warc_ts, html, text, lang)``.

The reference engine speaks its domain's container formats both ways
(``.osm``/``.osh`` XML and ``.pbf``, ``cut.hpp:73-74``); this module is
the webtext twin: the ISO 28500 WARC format Common Crawl ships crawls
in, written the way Common Crawl writes it —

- ``*.warc.gz``: ``response`` records (HTTP response head + the raw
  ``html`` payload), **one gzip member per record** so readers can
  byte-range into the middle of a file and inflate a whole record
  without touching the rest;
- ``*.wet.gz``: ``conversion`` records carrying the extracted ``text``
  plus the real-world ``WARC-Identified-Content-Language`` header (the
  per-url byte-identity invariant rides in this payload);
- ``*.gz.idx``: a sidecar member-offset index (``offset\\tlength`` per
  gzip member — the role Common Crawl's CDX index plays) so the reader
  can split ONE file across many tasks. DEFLATE has no sync marker, so
  without an index gzip members cannot be found except by inflating
  from the front; with it, any (offset, length) slice is a stand-alone
  multi-member gzip stream.

Scale shape: the sink range-partitions by (url, warc_ts) and packs each
partition's records executor-side in Arrow batches (payload bytes never
visit the driver unassembled — the ``plans/pbf_writer.py`` staging
pattern); the driver only streams staged fragments into one
``part-NNNNN`` file per partition, mirroring Common Crawl's
many-~1 GB-files layout. The reader parallelizes across files AND,
where an index sidecar exists, across record ranges inside a file; a
crawl-scale job therefore never serializes on file count or file size.

Determinism contract: record ids are content-derived (sha1 of
url + timestamp — no uuid/random), gzip members use mtime=0, and the
warcinfo preamble carries a fixed date, so the same frame always
serializes to the same bytes (the repo-wide reproducibility rule).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import struct
import zlib
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "encode_response_record",
    "encode_conversion_record",
    "encode_warcinfo_record",
    "gzip_member",
    "iter_members",
    "parse_records",
    "write_warc",
    "read_warc",
    "read_wet",
    "read_pages",
    "split_pages_to_warc",
]

_CRLF = b"\r\n"
#: fixed warcinfo date — determinism over realism (see module docstring)
_INFO_DATE = "2024-01-01T00:00:00Z"
#: records per read task when an index sidecar is available
RECORDS_PER_TASK = 2000
#: staged-fragment flush threshold (compressed bytes) in the sink
FRAGMENT_BYTES = 64 << 20


def _record_id(url: str, ts_iso: str) -> str:
    h = hashlib.sha1(f"{url}|{ts_iso}".encode()).hexdigest()
    return f"<urn:sha1:{h}>"


def _ts_iso(ts) -> str:
    """Naive-UTC timestamp (the engine pins sessions to UTC) → WARC-Date.

    Sub-second timestamps keep their microseconds (Spark timestamps are
    microsecond-precision) so the WARC roundtrip is lossless and the
    ``read_pages`` (url, warc_ts) join never fans out when two snapshots
    of a url land in the same second; whole-second timestamps keep the
    compact classic form so existing fixtures stay byte-identical.
    """
    t = pd.Timestamp(ts)
    if t.microsecond or t.nanosecond:
        return t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers
    )
    return (
        b"WARC/1.0" + _CRLF
        + head
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
        + payload
        + _CRLF + _CRLF
    )


def encode_response_record(url: str, ts, html: bytes) -> bytes:
    """``response`` record: HTTP/1.1 head + the raw html payload."""
    ts_iso = _ts_iso(ts)
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + f"Content-Length: {len(html)}".encode() + _CRLF
        + _CRLF
        + html
    )
    return _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", _record_id(url, ts_iso)),
            ("WARC-Date", ts_iso),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )


def encode_conversion_record(url: str, ts, text: str, lang: str) -> bytes:
    """WET ``conversion`` record: extracted text + identified language.

    NULL-tolerant: a null ``text`` serializes as the empty payload and a
    null/empty ``lang`` omits the language header entirely (``read_wet``
    reads an absent header back as ``""`` — never the string "None").
    """
    ts_iso = _ts_iso(ts)
    headers = [
        ("WARC-Type", "conversion"),
        ("WARC-Record-ID", _record_id(url + "#wet", ts_iso)),
        ("WARC-Refers-To", _record_id(url, ts_iso)),
        ("WARC-Date", ts_iso),
        ("WARC-Target-URI", url),
    ]
    if lang:
        headers.append(("WARC-Identified-Content-Language", lang))
    headers.append(("Content-Type", "text/plain"))
    return _record(headers, (text or "").encode("utf-8"))


def encode_warcinfo_record(filename: str) -> bytes:
    payload = (
        b"software: osm-history-splitter-spark" + _CRLF
        + b"format: WARC File Format 1.0" + _CRLF
    )
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _record_id(f"warcinfo:{filename}", _INFO_DATE)),
            ("WARC-Date", _INFO_DATE),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        payload,
    )


#: gzip member header for level-9 deflate: magic, CM=8, FLG=0, MTIME=0,
#: XFL=2 (best compression), OS=255 — the exact bytes
#: ``gzip.GzipFile(mtime=0)`` emits, pinned by
#: tests/test_warc.py::test_gzip_member_matches_stdlib
_GZ_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x02\xff"


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no filename).

    Hand-framed around a raw deflate stream with the same parameters the
    stdlib ``GzipFile`` uses — byte-identical output without the
    per-member ``GzipFile``/``BytesIO`` object churn (the sink calls
    this once per record)."""
    c = zlib.compressobj(
        9, zlib.DEFLATED, -zlib.MAX_WBITS, zlib.DEF_MEM_LEVEL, 0
    )
    body = c.compress(data) + c.flush()
    return (
        _GZ_HEADER
        + body
        + struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF)
    )


#: bounded feed size for the member decoder — caps the per-member
#: ``unused_data`` copy so a 2000-member task does O(range) memcpy, not
#: O(members × range) (the naive whole-tail ``decompress(data[i:])``
#: materializes the entire remaining buffer once per member)
_DECODE_CHUNK = 64 << 10


def iter_members(data: bytes):
    """Yield the decompressed payload of each gzip member in ``data``
    (a byte slice that starts ON a member boundary — e.g. a whole file
    or an index-aligned range).

    Streams each member through the decompressor in ``_DECODE_CHUNK``
    slices of a zero-copy memoryview: per member the only overshoot
    copy is the < one-chunk tail in ``unused_data``, so total memcpy is
    O(len(data) + members·chunk) instead of quadratic in the range.
    """
    mv = memoryview(data)
    i = 0
    n = len(data)
    while i < n:
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        parts = []
        j = i
        while not d.eof:
            if j >= n:
                raise ValueError(
                    f"truncated gzip member at offset {i}"
                )
            parts.append(d.decompress(mv[j:j + _DECODE_CHUNK]))
            j += _DECODE_CHUNK
        parts.append(d.flush())
        yield b"".join(parts)
        consumed = (min(j, n) - i) - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - corrupt stream guard
            raise ValueError(f"gzip member at offset {i} consumed 0 bytes")
        i += consumed


def parse_records(plain: bytes):
    """Parse concatenated WARC records from decompressed bytes.

    Yields ``(headers: dict, payload: bytes)`` — header keys lowercased.
    Tolerates any member↔record alignment because it walks
    Content-Length, never gzip boundaries.
    """
    i = 0
    n = len(plain)
    while i < n:
        if plain[i:i + 5] != b"WARC/":
            raise ValueError(f"expected WARC header at offset {i}")
        head_end = plain.index(b"\r\n\r\n", i)
        lines = plain[i:head_end].split(_CRLF)
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.decode("utf-8").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        start = head_end + 4
        payload = plain[start:start + length]
        i = start + length + 4  # trailing \r\n\r\n
        yield headers, payload


def _parse_http(payload: bytes) -> bytes:
    """Strip the HTTP response head from a ``response`` record payload."""
    sep = payload.index(b"\r\n\r\n")
    return payload[sep + 4:]


# ---------------------------------------------------------------- sink

def write_warc(
    df: DataFrame,
    out_dir: str,
    partitions: int = 4,
    wet: bool = True,
    by: str | None = None,
    prefix: str = "",
    task_side: bool = True,
) -> dict:
    """Distributed WARC(+WET) sink for a pages frame
    ``(url, warc_ts, html, text, lang)``.

    Rows are range-partitioned and sorted by (url, warc_ts) — every
    snapshot of a url lands in the same file, in version order (the
    O1/O2 order-reproduction rule applied to crawls).

    Default path (``task_side=True``): each TASK packs its partition
    into gzip members and writes its own ``part-NNNNN.warc.gz`` (and
    ``.wet.gz``) + ``.gz.idx`` directly — publish stays atomic per file
    (data streams into a ``.__tmp`` name, idx lands first,
    ``os.replace`` flips last), retried/speculative attempts write
    attempt-unique tmp names and the deterministic bytes make the final
    replace idempotent. The driver sees only a MANIFEST row per file:
    driver bandwidth is O(files), not O(corpus) — the bottleneck the
    previous ``orderBy → toLocalIterator`` funnel had, where every
    compressed byte crossed the driver single-threaded.
    ``task_side=False`` keeps that funnel for storage layers where
    executors cannot write the output directory (the fragments stage in
    parquet and the driver streams them out).

    ``prefix``: prepended to every part-file name — a continuous fetch
    service stamps each tick (``prefix=f"b{n:06d}-"``) so successive
    batches never collide and stay lexicographically ordered (the
    crawl-feed streaming source's offset contract).

    ``by``: optional grouping column (e.g. ``extract``) — output lands
    in one subdirectory per group, still ONE distributed job for all
    groups (the mixed-format sink discipline from ``plans/osm_writer``);
    the range partitioner keys on (by, url) so a group's files stay
    contiguous and a url never straddles files within a group.

    Returns ``{"files": [...], "records": n, "groups": {...}}``.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    key = [by] if by else []
    part = (
        df.select(*key, *cols)
        # key excludes warc_ts: a (url, ts) range boundary could strand
        # one snapshot of a url in the next file
        .repartitionByRange(partitions, *key, "url")
        .sortWithinPartitions(*key, "url", "warc_ts")
        .withColumn("pid", F.spark_partition_id())
    )
    if task_side:
        return _write_warc_task_side(part, out, wet, by, prefix)

    def pack(batches):
        # one Spark partition per task ⇒ a single pid; flush a fragment
        # row every FRAGMENT_BYTES so a ~1 GB output file never sits in
        # one task's memory (the pbf_writer BLOCK_ROWS discipline); the
        # sort makes groups contiguous, so a group change also flushes
        pid = None
        grp = None
        seq = 0
        warc_parts: list[bytes] = []
        wet_parts: list[bytes] = []
        lengths: list[int] = []
        wet_lengths: list[int] = []
        size = 0

        def flush():
            nonlocal seq, warc_parts, wet_parts, lengths, wet_lengths, size
            row = pd.DataFrame(
                {
                    "grp": [grp or ""],
                    "pid": [pid],
                    "seq": [seq],
                    "n_records": [len(lengths)],
                    "warc": [b"".join(warc_parts)],
                    "wet": [b"".join(wet_parts)],
                    "lengths": [lengths],
                    "wet_lengths": [wet_lengths],
                }
            )
            seq += 1
            warc_parts, wet_parts, lengths, wet_lengths, size = (
                [], [], [], [], 0
            )
            return row

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rg = getattr(r, by) if by else ""
                if lengths and rg != grp:
                    yield flush()
                    seq = 0
                pid = int(r.pid)
                grp = rg
                html = bytes(r.html) if r.html is not None else b""
                m = gzip_member(
                    encode_response_record(r.url, r.warc_ts, html)
                )
                warc_parts.append(m)
                lengths.append(len(m))
                size += len(m)
                if wet:
                    wm = gzip_member(
                        encode_conversion_record(
                            r.url, r.warc_ts, r.text, r.lang
                        )
                    )
                    wet_parts.append(wm)
                    wet_lengths.append(len(wm))
                if size >= FRAGMENT_BYTES:
                    yield flush()
        if lengths:
            yield flush()

    frags = part.mapInPandas(
        pack,
        schema=(
            "grp string, pid int, seq int, n_records long,"
            " warc binary, wet binary,"
            " lengths array<long>, wet_lengths array<long>"
        ),
    )
    files: list[str] = []
    groups: dict[str, int] = {}
    total = 0
    # fragments stream in (grp, pid, seq) order; driver appends — bounded
    cur = None
    warc_fh = wet_fh = None
    warc_path = wet_path = None
    offsets: list[str] = []
    wet_offsets: list[str] = []
    base = wet_base = 0

    def close_current():
        # publish is ATOMIC: data streams into a ``*.tmp`` name invisible
        # to the ``*.warc.gz`` / ``*.wet.gz`` globs, the idx lands first,
        # and os.replace flips the final name last — a concurrent reader
        # (the crawl-feed source's latestOffset listing) can never see a
        # half-written file or a file without its index
        nonlocal warc_fh, wet_fh
        if warc_fh is not None:
            warc_fh.close()
            warc_fh = None
            Path(str(warc_path) + ".idx").write_text(
                "\n".join(offsets) + "\n"
            )
            os.replace(str(warc_path) + ".tmp", warc_path)
        if wet_fh is not None:
            wet_fh.close()
            wet_fh = None
            Path(str(wet_path) + ".idx").write_text(
                "\n".join(wet_offsets) + "\n"
            )
            os.replace(str(wet_path) + ".tmp", wet_path)

    for row in frags.orderBy("grp", "pid", "seq").toLocalIterator():
        if (row["grp"], row["pid"]) != cur:
            close_current()
            cur = (row["grp"], row["pid"])
            dest = out / row["grp"] if by else out
            dest.mkdir(parents=True, exist_ok=True)
            name = f"{prefix}part-{row['pid']:05d}"
            warc_path = dest / f"{name}.warc.gz"
            info = gzip_member(encode_warcinfo_record(warc_path.name))
            warc_fh = open(str(warc_path) + ".tmp", "wb")
            warc_fh.write(info)
            offsets = [f"0\t{len(info)}"]
            base = len(info)
            files.append(str(warc_path))
            if wet:
                wet_path = dest / f"{name}.wet.gz"
                winfo = gzip_member(encode_warcinfo_record(wet_path.name))
                wet_fh = open(str(wet_path) + ".tmp", "wb")
                wet_fh.write(winfo)
                wet_offsets = [f"0\t{len(winfo)}"]
                wet_base = len(winfo)
                files.append(str(wet_path))
        warc_fh.write(bytes(row["warc"]))
        for ln in row["lengths"]:
            offsets.append(f"{base}\t{ln}")
            base += int(ln)
        if wet:
            wet_fh.write(bytes(row["wet"]))
            for ln in row["wet_lengths"]:
                wet_offsets.append(f"{wet_base}\t{ln}")
                wet_base += int(ln)
        n = int(row["n_records"])
        total += n
        if by:
            groups[row["grp"]] = groups.get(row["grp"], 0) + n
    close_current()
    return {"files": files, "records": total, "groups": groups}


def _write_warc_task_side(
    part: DataFrame, out: Path, wet: bool, by: str | None, prefix: str
) -> dict:
    """Executor-side body of :func:`write_warc`: every task writes its
    own (group, partition) files and returns manifest rows only."""
    out_str = str(out)

    def write_partition(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        state: dict = {"open": False}
        manifest: list[tuple] = []

        def start(grp: str, pid: int) -> None:
            dest = Path(out_str) / grp if by else Path(out_str)
            dest.mkdir(parents=True, exist_ok=True)
            name = f"{prefix}part-{pid:05d}"
            wp = dest / f"{name}.warc.gz"
            info = gzip_member(encode_warcinfo_record(wp.name))
            fh = open(f"{wp}.__tmp{attempt}", "wb")
            fh.write(info)
            state.update(
                open=True, grp=grp, pid=pid, n=0,
                warc_path=wp, warc_fh=fh,
                offsets=[f"0\t{len(info)}"], base=len(info),
            )
            if wet:
                wtp = dest / f"{name}.wet.gz"
                winfo = gzip_member(encode_warcinfo_record(wtp.name))
                wfh = open(f"{wtp}.__tmp{attempt}", "wb")
                wfh.write(winfo)
                state.update(
                    wet_path=wtp, wet_fh=wfh,
                    wet_offsets=[f"0\t{len(winfo)}"], wet_base=len(winfo),
                )

        def finish() -> None:
            if not state["open"]:
                return
            # same publish order as the driver path: close the data tmp,
            # land the idx under the FINAL name first, then os.replace
            # flips the data name last — a concurrent reader (the
            # crawl-feed source's latestOffset listing) can never see a
            # half-written file or a file without its index; retried
            # attempts replay the identical deterministic bytes, so the
            # final replace is idempotent
            wp = state["warc_path"]
            state["warc_fh"].close()
            Path(f"{wp}.idx").write_text("\n".join(state["offsets"]) + "\n")
            os.replace(f"{wp}.__tmp{attempt}", wp)
            wet_name = ""
            if wet:
                wtp = state["wet_path"]
                state["wet_fh"].close()
                Path(f"{wtp}.idx").write_text(
                    "\n".join(state["wet_offsets"]) + "\n"
                )
                os.replace(f"{wtp}.__tmp{attempt}", wtp)
                wet_name = str(wtp)
            manifest.append(
                (state["grp"], state["pid"], str(wp), wet_name, state["n"])
            )
            state["open"] = False

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rg = getattr(r, by) if by else ""
                if state["open"] and rg != state["grp"]:
                    finish()
                if not state["open"]:
                    start(rg, int(r.pid))
                html = bytes(r.html) if r.html is not None else b""
                m = gzip_member(
                    encode_response_record(r.url, r.warc_ts, html)
                )
                state["warc_fh"].write(m)
                state["offsets"].append(f"{state['base']}\t{len(m)}")
                state["base"] += len(m)
                if wet:
                    wm = gzip_member(
                        encode_conversion_record(
                            r.url, r.warc_ts, r.text, r.lang
                        )
                    )
                    state["wet_fh"].write(wm)
                    state["wet_offsets"].append(
                        f"{state['wet_base']}\t{len(wm)}"
                    )
                    state["wet_base"] += len(wm)
                state["n"] += 1
        finish()
        if manifest:
            yield pd.DataFrame(
                manifest,
                columns=["grp", "pid", "warc_file", "wet_file", "n_records"],
            )

    rows = part.mapInPandas(
        write_partition,
        schema=(
            "grp string, pid int, warc_file string, wet_file string,"
            " n_records long"
        ),
    ).collect()  # bounded: one manifest row per output file, not data
    files: list[str] = []
    groups: dict[str, int] = {}
    total = 0
    for r in sorted(rows, key=lambda r: (r["grp"], r["pid"])):
        files.append(r["warc_file"])
        if wet:
            files.append(r["wet_file"])
        total += int(r["n_records"])
        if by:
            groups[r["grp"]] = groups.get(r["grp"], 0) + int(r["n_records"])
    return {"files": files, "records": total, "groups": groups}


# -------------------------------------------------------------- source

def _read_tasks(path: str, pattern: str) -> list[tuple[str, int, int]]:
    """(file, offset, length) byte-range tasks. Index-aligned ranges of
    ≤ RECORDS_PER_TASK members where a ``<file>.idx`` sidecar exists;
    whole files otherwise (still one task per file — the Common Crawl
    file-level-parallel posture)."""
    tasks: list[tuple[str, int, int]] = []
    for f in sorted(_glob.glob(str(Path(path) / pattern))):
        idx = Path(f + ".idx")
        if idx.exists():
            rows = [
                tuple(map(int, line.split("\t")))
                for line in idx.read_text().splitlines()
                if line
            ]
            for i in range(0, len(rows), RECORDS_PER_TASK):
                chunk = rows[i:i + RECORDS_PER_TASK]
                lo = chunk[0][0]
                hi = chunk[-1][0] + chunk[-1][1]
                tasks.append((f, lo, hi - lo))
        else:
            tasks.append((f, 0, Path(f).stat().st_size))
    return tasks


def _read_frame(
    spark: SparkSession,
    path: str,
    pattern: str,
    schema: str,
    extract,
) -> DataFrame:
    tasks = _read_tasks(path, pattern)
    names = [c.strip().split(" ")[0] for c in schema.split(",")]
    tdf = spark.createDataFrame(
        tasks, "file string, off long, length long"
    ).repartition(max(1, len(tasks)))

    def decode(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                with open(t.file, "rb") as fh:
                    fh.seek(t.off)
                    raw = fh.read(t.length)
                plain = b"".join(iter_members(raw))
                for headers, payload in parse_records(plain):
                    r = extract(headers, payload)
                    if r is not None:
                        rows.append(r)
            if rows:
                yield pd.DataFrame(rows, columns=names)

    return tdf.mapInPandas(decode, schema=schema)


def _ts_parse(v: str):
    return pd.Timestamp(v.rstrip("Z"))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read → ``(url, warc_ts, html)``; skips
    non-``response`` records (warcinfo preambles etc.)."""

    def extract(headers, payload):
        if headers.get("warc-type") != "response":
            return None
        return (
            headers["warc-target-uri"],
            _ts_parse(headers["warc-date"]),
            _parse_http(payload),
        )

    return _read_frame(
        spark, path, "*.warc.gz",
        "url string, warc_ts timestamp, html binary", extract,
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET read → ``(url, warc_ts, text, lang)``."""

    def extract(headers, payload):
        if headers.get("warc-type") != "conversion":
            return None
        return (
            headers["warc-target-uri"],
            _ts_parse(headers["warc-date"]),
            payload.decode("utf-8"),
            headers.get("warc-identified-content-language", ""),
        )

    return _read_frame(
        spark, path, "*.wet.gz",
        "url string, warc_ts timestamp, text string, lang string", extract,
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Rebuild the full pages table ``(url, warc_ts, html, text, lang)``
    from a WARC+WET directory — response and conversion records joined
    on (url, warc_ts). The join is a plain equi-join on narrow keys;
    both payload columns arrive already distributed (never on the
    driver), so this is the standard crawl→table ingest shape.

    Raises ``ValueError`` on a WARC-only directory (written with
    ``wet=False``): the pages table needs the extracted ``text`` that
    only WET carries, and the inner join would otherwise return an
    empty frame that looks like a successful-but-empty split.
    """
    if not _glob.glob(str(Path(path) / "*.wet.gz")):
        raise ValueError(
            f"no *.wet.gz in {path}: read_pages needs WARC+WET "
            "(write the crawl with write_warc(..., wet=True), or use "
            "read_warc for the html-only frame)"
        )
    w = read_warc(spark, path)
    t = read_wet(spark, path)
    return w.join(t, ["url", "warc_ts"]).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def split_pages_to_warc(
    spark: SparkSession,
    pages: DataFrame,
    catalog,
    out_dir: str,
    partitions: int = 4,
    wet: bool = True,
) -> dict:
    """The flagship web-text split emitted in the crawl's own container
    format: geotag extraction → broadcast cell-cover spatial join →
    url-level softcut membership (ANY snapshot inside ⇒ ALL snapshots
    out, ``softcut.hpp:357-370`` applied to urls) → one WARC+WET
    directory per extract, written by ONE distributed job
    (``write_warc(by='extract')``).

    The per-url byte-identity invariant holds by construction: the sink
    serializes the ORIGINAL ``html``/``text`` bytes of every retained
    row — membership only selects rows, never rewrites them.
    """
    from ..functions.geotags import extract_geotags
    from ..operators.spatial_join import assign_extracts

    pts = pages.select(
        "url", F.explode(extract_geotags(F.col("text"))).alias("g")
    ).select(
        "url", F.col("g.lat").alias("lat"), F.col("g.lon").alias("lon")
    )
    members = (
        assign_extracts(pts, catalog).select("url", "extract").distinct()
    )
    tagged = pages.join(members, "url")
    return write_warc(
        tagged, out_dir, partitions=partitions, wet=wet, by="extract"
    )
