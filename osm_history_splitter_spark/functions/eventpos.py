"""THE deterministic event-position formula — one definition.

The ``events`` testdata table carries no coordinates, so every query
that needs a position derives one from ``(user_id, event_id)`` with
this fixed mixed-congruential formula. The Spark side lives HERE and
only here; the DuckDB oracle twins necessarily inline the same
arithmetic as SQL text (each twin is a self-contained ANSI string), and
``tests/test_driver_excluded.py`` / ``tools/selfcheck.py`` hold the two
sides equal — so a drift in the constants breaks loudly instead of
letting a consumer (e.g. the streaming heatmap) silently diverge from
the oracle-certified batch queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["event_lon_lat"]


def event_lon_lat(k: Column, e: Column) -> tuple[Column, Column]:
    """(lon, lat) of the deterministic synthetic position of event
    ``e`` of user ``k`` — 0.01°-grid points covering the full globe.

    SQL twin (inline in every oracle string)::

        ((user_id * 7919 + event_id * 13) % 36000) / 100.0 - 180.0
        ((user_id * 104729 + event_id * 29) % 18000) / 100.0 - 90.0
    """
    lon = ((k * 7919 + e * 13) % 36000) / F.lit(100.0) - F.lit(180.0)
    lat = ((k * 104729 + e * 29) % 18000) / F.lit(100.0) - F.lit(90.0)
    return lon, lat
