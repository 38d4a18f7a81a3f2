"""Fixed schemas of the versioned-entity data model.

The reference engine's three handler streams (reference ``cut.hpp:34-52``,
``hardcut.hpp:137-264``) become three fixed-schema DataFrames; the extract
catalog (``splitter.cpp:101-184``) becomes a small driver-side table that is
broadcast into every join. Schemas are static — the reference has no schema
inference and neither do we.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- entity streams ---------------------------------------------------------

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("visible", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("visible", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

MEMBER_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType(), False),  # 'n' | 'w' | 'r'
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("visible", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("members", T.ArrayType(MEMBER_TYPE), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# --- extract catalog --------------------------------------------------------
# kind: 'BBOX' (strict bounds, reference cut.hpp:36-40) or 'POLY'/'OSM'
# (interior-only point-in-polygon, reference cut.hpp:42-49). rings is the
# multipolygon as a flat list of closed rings (even-odd rule: outers and
# holes are not distinguished — matches GEOS interior semantics for valid
# geometries and the OSM-kind "all closed ways are outers" rule).

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("extract", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("minlon", T.DoubleType(), True),
        T.StructField("minlat", T.DoubleType(), True),
        T.StructField("maxlon", T.DoubleType(), True),
        T.StructField("maxlat", T.DoubleType(), True),
        # rings: array of rings; ring: array of [lon, lat] pairs
        T.StructField(
            "rings",
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
            True,
        ),
    ]
)

# --- web-pages table (BASELINE.json input_hint) -----------------------------

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

GEOTAG_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType(), False),
            T.StructField("lon", T.DoubleType(), False),
        ]
    )
)


# --- history-compat rule (S10) -----------------------------------------------


def is_history_table(df) -> bool:
    """A table is history-shaped iff it carries ``version`` + ``visible``
    (multiple versions per id, deletions represented as invisible rows)."""
    return {"version", "visible"}.issubset(set(df.columns))


def validate_history_compat(df, entity: str = "input", expect_history: bool = True) -> None:
    """Reference rule (``/root/reference/README.md:87``): splitting a
    history file into a non-history output — or feeding a non-history file
    to a history split — is an error, not a silent coercion. Raises
    ``ValueError`` on mismatch."""
    has = is_history_table(df)
    if expect_history and not has:
        raise ValueError(
            f"{entity}: history split requires version+visible columns, "
            f"got {df.columns} (non-history input into a history job)"
        )
    if not expect_history and has:
        raise ValueError(
            f"{entity}: non-history split over a history table would "
            f"silently collapse versions; project to the latest visible "
            f"version first (got columns {df.columns})"
        )
