"""Distributed ingestion of large ``.osm``/``.osh`` XML into the engine's
node/way/relation tables (reference S1: osmium's streaming reader,
``splitter.cpp:8-15`` — the reference streams multi-GB planet files; the
engine's scale path into its parquet/Iceberg tables is this job).

Why not ``spark.read.format("xml")``: Spark's native XML source does not
split WITHIN a file (verified locally: a multi-MB file reads as one
partition), so a planet-sized single ``.osh`` would serialize on one task.

Two splittable readers, by scale:

- ``read_osm_elements`` — ``spark.read.text`` with the element start tag
  as a custom record delimiter; rides Hadoop's LineRecordReader, each
  record one OSM element parsed in Arrow-batched ``mapInPandas``.
  Limitation: everything BEFORE the first requested tag (the whole nodes
  section, when reading ways from a planet file) is one unsplittable
  record — fine for homogeneous or small files, not for the planet.
- ``read_osm_elements_ranged`` — the planet path: driver-side byte
  ranges, each task seeks + overscans and owns exactly the elements
  whose start byte falls in its range. No region of the file is ever a
  single record; memory per task is range + overscan, regardless of
  where the tag's section sits.

Soundness of the split: raw ``<`` cannot appear in XML attribute values or
text content (it must be ``&lt;``), so ``<node``/``<way``/``<relation``
occur ONLY at element starts. ``>`` MAY appear raw inside attribute
values, hence the quote-aware scan for the start-tag end instead of a
naive ``find('>')``. KNOWN LIMITATION: the byte scanner does not parse
XML comments/CDATA/processing instructions, so a comment containing a
literal ``<node …/>`` would emit a phantom row — no OSM dump generator
(osmium, planet-dump-ng, the API) emits comments inside the element
stream, and the reference's SAX readers share the assumption for the
formats it splits, but a hand-edited file can violate it.

The driver-side fixture loader (``osm_xml.load_osm_dataframes``) remains
for tiny files; equivalence of the two is asserted in
tests/test_sources.py on the reference's own golden ``.osh``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA

__all__ = [
    "ingest_osm_xml",
    "read_osm_elements",
    "read_osm_elements_ranged",
]


def _element_snippet(record: str, tag: str) -> str | None:
    """Trim one delimiter-split record to the complete element, or None if
    the record holds no element (the pre-first-element file header)."""
    # quote-aware scan for the true end of the start tag ('>' may appear
    # raw inside attribute values)
    i, inq = 0, ""
    n = len(record)
    while i < n:
        c = record[i]
        if inq:
            if c == inq:
                inq = ""
        elif c in "'\"":
            inq = c
        elif c == ">":
            break
        i += 1
    if i >= n:
        return None
    # i > 0 guard: an attribute-less element ('<relation>') puts '>' at
    # index 0 and record[-1] would inspect the record's LAST byte
    if i > 0 and record[i - 1] == "/":  # self-closing element
        return f"<{tag}" + record[: i + 1]
    close = f"</{tag}>"
    end = record.find(close, i)
    if end == -1:
        return None  # header record / malformed tail
    return f"<{tag}" + record[: end + len(close)]


def _meta_cols(el) -> dict:
    ts = el.get("timestamp")
    return {
        "id": int(el.get("id")),
        "version": int(el.get("version", "1")),
        "visible": el.get("visible", "true") == "true",
        "ts": pd.Timestamp(ts.rstrip("Z")) if ts else None,
        "uid": int(el.get("uid", "0")),
        "changeset": int(el.get("changeset", "0")),
        "user": el.get("user", ""),
        "tags": {t.get("k"): t.get("v") for t in el.findall("tag")},
    }


def read_osm_elements(spark: SparkSession, path: str, tag: str) -> DataFrame:
    """One entity kind from (possibly huge, possibly many) OSM XML files,
    distributed both across files and WITHIN each file."""
    if tag == "node":
        schema, build = NODE_SCHEMA, _build_nodes
    elif tag == "way":
        schema, build = WAY_SCHEMA, _build_ways
    elif tag == "relation":
        schema, build = RELATION_SCHEMA, _build_relations
    else:
        raise ValueError(f"unknown OSM element tag {tag!r}")

    raw = spark.read.text(path, lineSep=f"<{tag}")
    cols = [f.name for f in schema.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf["value"]:
                snippet = _element_snippet(rec, tag)
                if snippet is None:
                    continue
                el = ET.fromstring(snippet)
                rows.append(build(el))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(parse, schema=schema)


def _build_nodes(el) -> dict:
    m = _meta_cols(el)
    lat, lon = el.get("lat"), el.get("lon")
    m["lat"] = float(lat) if lat is not None else None
    m["lon"] = float(lon) if lon is not None else None
    return m


def _build_ways(el) -> dict:
    m = _meta_cols(el)
    m["refs"] = [int(nd.get("ref")) for nd in el.findall("nd")]
    return m


def _build_relations(el) -> dict:
    m = _meta_cols(el)
    m["members"] = [
        {
            "type": mm.get("type", "")[:1],
            "ref": int(mm.get("ref")),
            "role": mm.get("role", ""),
        }
        for mm in el.findall("member")
    ]
    return m


def _extract_element_bytes(buf: bytes, pos: int, tag: str) -> bytes | None:
    """The complete element whose ``<tag`` starts at ``buf[pos]``, or None
    if the buffer ends before the element does (caller raises: overscan
    too small). Quote-aware: '>' may appear raw inside attribute values.
    Operates on BYTES so offsets stay consistent with file byte ranges
    (UTF-8 continuation bytes are >= 0x80 and can never alias the ASCII
    quote/'>' bytes, so the scan is multi-byte-safe)."""
    i, inq = pos, 0
    n = len(buf)
    q1, q2, gt = ord("'"), ord('"'), ord(">")
    while i < n:
        c = buf[i]
        if inq:
            if c == inq:
                inq = 0
        elif c in (q1, q2):
            inq = c
        elif c == gt:
            break
        i += 1
    if i >= n:
        return None
    if buf[i - 1] == ord("/"):
        return buf[pos : i + 1]
    close = b"</" + tag.encode() + b">"
    end = buf.find(close, i)
    if end == -1:
        return None
    return buf[pos : end + len(close)]


def read_osm_elements_ranged(
    spark: SparkSession,
    path: str,
    tag: str,
    split_bytes: int = 64 << 20,
    overscan_bytes: int = 16 << 20,
) -> DataFrame:
    """Byte-range splittable reader for ONE huge ``.osm/.osh`` XML file —
    the true planet-scale path. The delimiter reader above distributes
    records of the REQUESTED tag, but everything before the first
    occurrence (the entire nodes section, when reading ways from a planet
    file) arrives as one unsplittable record that breaks the 2 GB
    Text/Arrow limits. This reader has no such region:

    1. the driver splits the file into fixed byte ranges (metadata only —
       no data read);
    2. each task seeks to its range, reads range+overscan, and parses
       exactly the elements whose ``<tag`` START byte falls inside its
       range — an element straddling the range end is completed from the
       overscan, and the next task skips it (its start lies before that
       task's range);
    3. ownership-by-start-offset makes the union across tasks exactly the
       file's element set, each element parsed once.

    Raw ``<`` cannot appear in XML attribute values, so start-tag matches
    are sound; ``>`` can, so element extraction scans quote-aware.
    ``overscan_bytes`` bounds the largest single element (a 16 MB OSM
    element is pathological; the reader raises rather than truncate).
    Local/NFS paths; for object stores swap the ``open`` for fsspec.
    """
    if tag == "node":
        schema, build = NODE_SCHEMA, _build_nodes
    elif tag == "way":
        schema, build = WAY_SCHEMA, _build_ways
    elif tag == "relation":
        schema, build = RELATION_SCHEMA, _build_relations
    else:
        raise ValueError(f"unknown OSM element tag {tag!r}")

    import os

    size = os.path.getsize(path)
    ranges = [
        (lo, min(lo + split_bytes, size))
        for lo in range(0, size, split_bytes)
    ] or [(0, 0)]
    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        len(ranges)
    )
    cols = [f.name for f in schema.fields]
    start_pat = b"<" + tag.encode()
    boundary = b" \t\n\r/>"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                lo, hi = int(lo), int(hi)
                with open(path, "rb") as f:
                    f.seek(lo)
                    buf = f.read((hi - lo) + overscan_bytes)
                limit = hi - lo  # element START bytes must fall before this
                pos = 0
                while True:
                    pos = buf.find(start_pat, pos)
                    if pos == -1 or pos >= limit:
                        break
                    after = pos + len(start_pat)
                    if after < len(buf) and buf[after] not in boundary:
                        pos = after  # '<nodeish' false match
                        continue
                    snippet = _extract_element_bytes(buf, pos, tag)
                    if snippet is None:
                        raise ValueError(
                            f"element at byte {lo + pos} exceeds overscan "
                            f"({overscan_bytes}B) — raise overscan_bytes"
                        )
                    rows.append(build(ET.fromstring(snippet.decode("utf-8"))))
                    pos += len(snippet)
            yield pd.DataFrame(rows, columns=cols)

    return rdf.mapInPandas(parse, schema=schema)


def ingest_osm_xml(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, ways, relations) DataFrames from OSM XML — the distributed
    twin of ``osm_xml.load_osm_dataframes``."""
    return (
        read_osm_elements(spark, path, "node"),
        read_osm_elements(spark, path, "way"),
        read_osm_elements(spark, path, "relation"),
    )
