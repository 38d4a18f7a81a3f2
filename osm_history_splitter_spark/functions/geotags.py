"""Geotag extraction from page text/html (north_star F7).

``extract_geotags`` is a vectorized pandas UDF (Arrow-batched, no per-row
Python in the JVM loop) returning every geotag in a page as
``array<struct<lat, lon>>``. The wire format parsed here is the engine's
deterministic marker ``GEO(latc=<int>;lonc=<int>)`` with integer hundredths
of degrees — integer wire format keeps Spark and SQL-oracle parsing
bit-identical (no float-printing ambiguity).

A Catalyst-only single-geotag fast path (``first_geotag_cols``) exists for
pages known to carry at most one tag; it compiles to ``regexp_extract`` and
never leaves the JVM.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import GEOTAG_TYPE

GEO_RE = re.compile(r"GEO\(latc=(-?\d+);lonc=(-?\d+)\)")
GEO_PATTERN_SQL = r"GEO\(latc=(-?\d+);lonc=(-?\d+)\)"


@F.pandas_udf(GEOTAG_TYPE)
def extract_geotags(text: pd.Series) -> pd.Series:
    def parse(s):
        if s is None:
            return []
        return [
            {"lat": int(m[0]) / 100.0, "lon": int(m[1]) / 100.0}
            for m in GEO_RE.findall(s)
        ]

    return text.map(parse)


def first_geotag_cols(text: Column) -> tuple[Column, Column]:
    """(lat, lon) of the first geotag via Catalyst regexp — whole-stage
    codegen, used when the marker grammar guarantees ≤1 tag per row."""
    latc = F.regexp_extract(text, GEO_PATTERN_SQL, 1)
    lonc = F.regexp_extract(text, GEO_PATTERN_SQL, 2)
    lat = F.when(latc != "", latc.cast("long") / 100.0)
    lon = F.when(lonc != "", lonc.cast("long") / 100.0)
    return lat, lon
