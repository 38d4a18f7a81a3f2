""".osm / .osh XML loader (reference S1/S5: osmium's XML reader).

Two uses:
1. entity-stream loading of the small test fixtures into the three
   DataFrames (driver-side parse — fixtures are tiny; planet-scale inputs
   arrive as parquet/Iceberg tables, never XML);
2. the OSM geometry source (reference ``geometryreader.hpp:18-104``): every
   **closed** way in the file becomes an outer polygon ring — holes are
   impossible in this kind (reference ``README.md:84``).
"""

from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np
from pyspark.sql import SparkSession

from ..functions.geometry import close_ring
from ..model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA

__all__ = ["parse_osm_xml", "load_osm_dataframes", "rings_from_osm_file"]


def _ts(s: str | None):
    if not s:
        return None
    return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")


def _meta(el):
    return (
        int(el.get("id")),
        int(el.get("version", "1")),
        el.get("visible", "true") == "true",
        _ts(el.get("timestamp")),
        int(el.get("uid", "0")),
        int(el.get("changeset", "0")),
        el.get("user", ""),
    )


def parse_osm_xml(path: str | Path):
    """→ (node_rows, way_rows, relation_rows) matching model schemas."""
    nodes, ways, relations = [], [], []
    root = ET.parse(str(path)).getroot()
    for el in root:
        tags = {
            t.get("k"): t.get("v") for t in el.findall("tag")
        }
        if el.tag == "node":
            # deleted versions carry no position in OSM history files
            lat, lon = el.get("lat"), el.get("lon")
            nodes.append(
                _meta(el)
                + (
                    float(lat) if lat is not None else None,
                    float(lon) if lon is not None else None,
                    tags,
                )
            )
        elif el.tag == "way":
            refs = [int(nd.get("ref")) for nd in el.findall("nd")]
            ways.append(_meta(el) + (refs, tags))
        elif el.tag == "relation":
            members = [
                (m.get("type")[0], int(m.get("ref")), m.get("role", ""))
                for m in el.findall("member")
            ]
            relations.append(_meta(el) + (members, tags))
    return nodes, ways, relations


def load_osm_dataframes(spark: SparkSession, path: str | Path):
    nodes, ways, relations = parse_osm_xml(path)
    return (
        spark.createDataFrame(nodes, schema=NODE_SCHEMA),
        spark.createDataFrame(ways, schema=WAY_SCHEMA),
        spark.createDataFrame(relations, schema=RELATION_SCHEMA),
    )


def rings_from_osm_file(path: str | Path) -> list[np.ndarray]:
    """OSM geometry source: closed ways → outer rings (S5+S7).

    The coordinate join (reference ``cfw_handler_t``,
    ``geometryreader.hpp:46-90``) is a dict lookup here — geometry files are
    driver-side catalog inputs, not data-plane tables.
    """
    nodes, ways, _ = parse_osm_xml(path)
    coord = {n[0]: (n[8], n[7]) for n in nodes}  # id -> (lon, lat)
    rings = []
    for w in ways:
        refs = w[7]
        # closed-way predicate (geometryreader.hpp:26-29,71-74)
        if len(refs) >= 4 and refs[0] == refs[-1]:
            try:
                pts = [coord[r] for r in refs]
            except KeyError:
                continue  # way references a node not in the file
            rings.append(close_ring(np.asarray(pts, dtype=np.float64)))
    if not rings:
        raise ValueError(f"no closed ways in OSM geometry file {path}")
    return rings
