"""Geodesic helpers: haversine distance, way centroid, point-on-surface.

Reference semantics: orb ``geo.Distance`` (haversine, R=6378137 m) as
used by annotate/geo.go:31-53 (length-weighted segment-midpoint centroid)
and geo.go:13-29 (point-on-surface = node closest to centroid —
ST_PointOnSurface style). Column math only; SQL twins mirror operation
order for cross-engine float parity.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS = 6378137.0
_D2R = math.pi / 180.0


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (orb geo.Distance semantics)."""
    la1, lo1 = _col(lat1) * _D2R, _col(lon1) * _D2R
    la2, lo2 = _col(lat2) * _D2R, _col(lon2) * _D2R
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS) * F.asin(F.sqrt(a))


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Byte-identical DuckDB twin of :func:`haversine_m`."""
    la1, lo1 = f"(({lat1}) * {_D2R!r})", f"(({lon1}) * {_D2R!r})"
    la2, lo2 = f"(({lat2}) * {_D2R!r})", f"(({lon2}) * {_D2R!r})"
    dlat, dlon = f"({la2} - {la1})", f"({lo2} - {lo1})"
    a = (
        f"(sin({dlat} / 2) * sin({dlat} / 2)"
        f" + cos({la1}) * cos({la2}) * sin({dlon} / 2) * sin({dlon} / 2))"
    )
    return f"({2.0 * EARTH_RADIUS!r} * asin(sqrt({a})))"
