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


def bearing_deg(lat1, lon1, lat2, lon2) -> Column:
    """Initial great-circle bearing in degrees (orb geo.Bearing
    semantics: atan2(sin Δλ·cos φ2, cos φ1·sin φ2 − sin φ1·cos φ2·cos Δλ),
    range (−180, 180])."""
    la1, lo1 = _col(lat1) * _D2R, _col(lon1) * _D2R
    la2, lo2 = _col(lat2) * _D2R, _col(lon2) * _D2R
    dlon = lo2 - lo1
    y = F.sin(dlon) * F.cos(la2)
    x = F.cos(la1) * F.sin(la2) - F.sin(la1) * F.cos(la2) * F.cos(dlon)
    return F.atan2(y, x) * F.lit(180.0 / math.pi)


def bearing_deg_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Byte-identical DuckDB twin of :func:`bearing_deg`."""
    la1, lo1 = f"(({lat1}) * {_D2R!r})", f"(({lon1}) * {_D2R!r})"
    la2, lo2 = f"(({lat2}) * {_D2R!r})", f"(({lon2}) * {_D2R!r})"
    dlon = f"({lo2} - {lo1})"
    y = f"(sin({dlon}) * cos({la2}))"
    x = f"(cos({la1}) * sin({la2}) - sin({la1}) * cos({la2}) * cos({dlon}))"
    return f"(atan2({y}, {x}) * {180.0 / math.pi!r})"


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


# Per-edge spherical shoelace term, pre-scaled to km^2 and
# floor-quantized: the 1-ulp sin() divergence between the JVM and
# libm scales to ~3e-8 km^2 here, so the int64 terms (and therefore
# their order-independent SUM) match across engines.
_AREA_K = EARTH_RADIUS * EARTH_RADIUS / 2.0 / 1e6


def ring_area_term_km2(lat1, lon1, lat2, lon2) -> Column:
    """Signed spherical shoelace edge term (orb geo.Area semantics:
    the Chamberlain–Duquette spherical shoelace: accumulate
    (λ2−λ1)·(2+sin φ1+sin φ2), total × R²/2 — CLOCKWISE rings come out
    positive under this variant), floor-quantized to int64 km²."""
    la1, lo1 = _col(lat1) * _D2R, _col(lon1) * _D2R
    la2, lo2 = _col(lat2) * _D2R, _col(lon2) * _D2R
    t = (lo2 - lo1) * (F.lit(2.0) + F.sin(la1) + F.sin(la2))
    return F.floor(t * F.lit(_AREA_K)).cast("long")


def ring_area_term_km2_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Byte-identical DuckDB twin of :func:`ring_area_term_km2`."""
    la1, lo1 = f"(({lat1}) * {_D2R!r})", f"(({lon1}) * {_D2R!r})"
    la2, lo2 = f"(({lat2}) * {_D2R!r})", f"(({lon2}) * {_D2R!r})"
    t = f"(({lo2} - {lo1}) * (2.0 + sin({la1}) + sin({la2})))"
    return f"CAST(floor({t} * {_AREA_K!r}) AS BIGINT)"
