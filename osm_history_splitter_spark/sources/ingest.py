"""Distributed ingestion of large ``.osm``/``.osh`` XML into the engine's
node/way/relation tables (reference S1: osmium's streaming reader,
``splitter.cpp:8-15`` — the reference streams multi-GB planet files; the
engine's scale path into its parquet/Iceberg tables is this job).

Why not ``spark.read.format("xml")``: Spark's native XML source does not
split WITHIN a file (verified locally: a multi-MB file reads as one
partition), so a planet-sized single ``.osh`` would serialize on one task.
This reader is splittable: ``spark.read.text`` with the element start tag
as a custom record delimiter rides Hadoop's LineRecordReader, which
distributes records across partition boundaries correctly; each record is
then one OSM element (plus trailing non-element text, trimmed by a
quote-aware scanner) parsed in an Arrow-batched ``mapInPandas`` — never
per-row Python.

Soundness of the split: raw ``<`` cannot appear in XML attribute values or
text content (it must be ``&lt;``), so ``<node``/``<way``/``<relation``
occur ONLY at element starts. ``>`` MAY appear raw inside attribute
values, hence the quote-aware scan for the start-tag end instead of a
naive ``find('>')``.

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

__all__ = ["ingest_osm_xml", "read_osm_elements"]


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
    if record[i - 1] == "/":  # self-closing element
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
