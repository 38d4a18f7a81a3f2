"""Spatial membership predicates.

- strict bbox containment: plain Catalyst comparisons, matching the
  reference's strict inequalities (reference ``cut.hpp:36-40`` — a node
  exactly on the bbox edge is OUT). Stays in whole-stage codegen.
- exact point-in-polygon: interior-only even-odd test (reference
  ``cut.hpp:42-49`` keeps GEOS ``Location::INTERIOR`` only), as a vectorized
  pandas UDF over Arrow batches. Only boundary-cell candidates from the grid
  cover reach this UDF; fully-inside cells are accepted JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .geometry import points_in_rings

__all__ = ["bbox_strict_expr", "make_pip_udf", "haversine_km_expr"]


def bbox_strict_expr(
    lon: Column, lat: Column, minlon, minlat, maxlon, maxlat
) -> Column:
    """Strict open-interval bbox test (reference ``cut.hpp:36-40``)."""
    return (
        (lon > minlon) & (lat > minlat) & (lon < maxlon) & (lat < maxlat)
    )


def make_pip_udf(
    rings_by_extract: dict[str, list[np.ndarray]],
    holes_by_extract: dict[str, list[bool]] | None = None,
):
    """Build ``pip_exact(extract, lon, lat) -> boolean`` pandas UDF.

    ``rings_by_extract`` is captured in the UDF closure (pickled once per
    executor, not per row) — the distributed analog of the reference building
    one ``IndexedPointInAreaLocator`` per extract up front
    (``cut.hpp:111``). Batches are grouped by extract inside the UDF so each
    polygon's vectorized test runs once per (batch, extract).

    ``holes_by_extract`` carries per-ring hole flags for extracts parsed
    from .poly files: those compose with the reference's GEOS-union rule
    (even-odd inside ANY outer, minus holes — geometry.points_in_rings
    ``holes=``); extracts without flags keep parity composition.
    """
    # normalize to plain numpy arrays for a compact pickle
    payload = {
        k: [np.asarray(r, dtype=np.float64) for r in v]
        for k, v in rings_by_extract.items()
    }
    hole_payload = dict(holes_by_extract or {})

    @F.pandas_udf(T.BooleanType())
    def pip_exact(extract: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(extract), dtype=bool)
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        ex = extract.to_numpy()
        for name in pd.unique(ex):
            rings = payload.get(name)
            if rings is None:
                continue
            mask = ex == name
            out[mask] = points_in_rings(
                lon_v[mask], lat_v[mask], rings,
                holes=hole_payload.get(name),
            )
        return pd.Series(out, index=extract.index)

    return pip_exact


def haversine_km_expr(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle distance in km via Catalyst trig builtins — no UDF
    (SURVEY §2.8: kNN distance is a plain expression)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    )
    return F.lit(6371.0088) * F.lit(2.0) * F.atan2(F.sqrt(a), F.sqrt(1 - a))
