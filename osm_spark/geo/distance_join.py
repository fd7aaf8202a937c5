"""Within-distance spatial join (range join -> cell equi-join).

All pairs of points within ``d`` meters: the theta join becomes an
equi-join on grid cells — pick the coarsest zoom whose cell ground
extent is >= d everywhere in the data's latitude band, have the LEFT
side emit its 3x3 cell neighborhood (9 keys) and the right side its
own cell (1 key), equi-join, refine with exact haversine. Any pair
within d sits in the same or an adjacent cell, so recall is exact;
shuffle volume is 9x|points| + |points| keys, never all-pairs.

Skew: hot cells (cities) split via AQE skew join + the deterministic
pair orientation (a < b) halves the candidate set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import distance, tiles

EARTH_M_PER_DEG = 111_320.0


def zoom_for_distance(d_m: float, max_abs_lat: float = 85.0) -> int:
    """Coarsest zoom whose cells are at least ``d_m`` wide across the
    latitude band (web-mercator cells shrink by cos(lat) on the
    ground; size at zoom z ~ 360/2^z * 111320 * cos(lat))."""
    min_cos = math.cos(math.radians(min(abs(max_abs_lat), 85.0)))
    z = 0
    while z < 18:
        cell_m = 360.0 / (1 << (z + 1)) * EARTH_M_PER_DEG * min_cos
        if cell_m < d_m:
            break
        z += 1
    return z


def within_distance_pairs(
    points: DataFrame,
    d_m: float,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    zoom: int | None = None,
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """(a, b, dist_floor_m) for all pairs with floor(haversine) <= d_m,
    a < b. The threshold is applied to the FLOOR-QUANTIZED distance
    (haversine is transcendental, so the raw value is not cross-engine
    comparable): for integral ``d_m`` this is exactly ``haversine <
    d_m + 1``; for fractional ``d_m`` pairs in (d_m, floor(d_m) + 1)
    are admitted too. The oracle applies the identical quantization."""
    if zoom is None:
        zoom = zoom_for_distance(d_m, max_abs_lat)
    n = 1 << zoom
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        tiles.tile_x(lon_col, zoom).alias("_cx"),
        tiles.tile_y(lat_col, zoom).alias("_cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = base.select(
        F.col("_id").alias("a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        F.explode(offs).alias("_o"),
        "_cx",
        "_cy",
    ).select(
        "a",
        "lat_a",
        "lon_a",
        F.pmod(F.col("_cx") + F.col("_o.dx"), F.lit(n)).alias("jx"),
        (F.col("_cy") + F.col("_o.dy")).alias("jy"),
    )
    right = base.select(
        F.col("_id").alias("b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("_cx").alias("jx"),
        F.col("_cy").alias("jy"),
    )
    cand = left.join(right, ["jx", "jy"]).where(F.col("a") < F.col("b"))
    dist = distance.haversine_m("lat_a", "lon_a", "lat_b", "lon_b")
    # a pair meets on exactly one (jx, jy) normally; distinct() guards
    # the degenerate tiny-n case where x-wrap aliases neighbor offsets
    return (
        cand.select("a", "b", F.floor(dist).alias("dist_floor_m"))
        .where(F.col("dist_floor_m") <= math.floor(d_m))
        .distinct()
    )
