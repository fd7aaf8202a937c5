"""Raster <-> vector tile rasterization (north-star component).

The engine's raster model reuses the slippy-tile grid: a raster tile at
zoom ``z`` with ``2^res_bits`` pixels per side is exactly the set of
sub-tiles at zoom ``z + res_bits`` (so all pixel math is the maptile
shift math of SURVEY §1.5 — no new projection code; reference tile
semantics: /root/reference/bounds.go:18-34).

Scale design (10^12 pages):
- ``rasterize_sparse`` is ONE groupBy over (tile, pixel) — map-side
  partial aggregation; output cardinality is bounded by the tile/pixel
  grid, not the input row count.
- ``rasterize_dense`` consumes the SPARSE table, so every
  ``applyInPandas`` group is <= 4^res_bits rows no matter how hot the
  tile is — skew-proof by construction; a popular-geocode hot spot
  never creates a hot group. Partitioning before the fill is the
  groupBy shuffle on (tile_x, tile_y); for clustered output, sort by
  ``tiles.quadkey_value(tile_x, tile_y)`` (cell-prefix order).
- ``vectorize`` inverts the raster back to per-pixel centroid points
  (inverse Mercator at pixel zoom) — pure column math, and
  re-tiling those centroids reproduces the pixel indices exactly
  (round-trip fixture property, see tests/test_raster.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import tiles


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rasterize_sparse(
    pts: DataFrame, z: int, res_bits: int, lat="lat", lon="lon"
) -> DataFrame:
    """Sparse raster: (tile_x, tile_y, px, py, n) — pixel (px,py) is the
    point's sub-tile at zoom z+res_bits, local to its z-tile."""
    zp = z + res_bits
    res_mask = (1 << res_bits) - 1
    xp = tiles.tile_x(_col(lon), zp)
    yp = tiles.tile_y(_col(lat), zp)
    return (
        pts.select(
            F.shiftright(xp, res_bits).alias("tile_x"),
            F.shiftright(yp, res_bits).alias("tile_y"),
            xp.bitwiseAND(F.lit(res_mask)).alias("px"),
            yp.bitwiseAND(F.lit(res_mask)).alias("py"),
        )
        .groupBy("tile_x", "tile_y", "px", "py")
        .agg(F.count("*").alias("n"))
    )


def rasterize_dense(sparse: DataFrame, res_bits: int) -> DataFrame:
    """Dense raster per tile: row-major ``grid: array<long>`` of length
    4^res_bits, filled with numpy from the sparse pixel counts.

    Input MUST be the output of :func:`rasterize_sparse` (pre-aggregated),
    which caps each group at 4^res_bits rows — the fill is O(pixels),
    never O(pages).
    """
    res = 1 << res_bits

    import numpy as np

    def fill(key, pdf: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros(res * res, dtype="int64")
        grid[pdf["py"].to_numpy() * res + pdf["px"].to_numpy()] = pdf[
            "n"
        ].to_numpy()
        return pd.DataFrame(
            {"tile_x": [key[0]], "tile_y": [key[1]], "grid": [grid]}
        )

    return sparse.groupBy("tile_x", "tile_y").applyInPandas(
        fill, "tile_x long, tile_y long, grid array<long>"
    )


def dense_to_sparse(dense: DataFrame, res_bits: int) -> DataFrame:
    """Vector re-extraction step 1: explode the dense grid back to
    nonzero (tile_x, tile_y, px, py, n) rows — pure posexplode, no UDF."""
    res = 1 << res_bits
    return (
        dense.select(
            "tile_x", "tile_y", F.posexplode("grid").alias("pos", "n")
        )
        .where(F.col("n") > 0)
        .select(
            "tile_x",
            "tile_y",
            (F.col("pos") % res).alias("px"),
            (F.col("pos") / res).cast("long").alias("py"),
            "n",
        )
    )


def vectorize(sparse: DataFrame, z: int, res_bits: int) -> DataFrame:
    """Per-pixel centroid points: inverse-Mercator the center of each
    nonzero pixel (zoom z+res_bits) — column math only (tile.Bound
    midpoint; reference bounds.go:27-33 back-projection)."""
    zp = z + res_bits
    n = float(1 << zp)
    xp = F.shiftleft("tile_x", res_bits) + F.col("px")
    yp = F.shiftleft("tile_y", res_bits) + F.col("py")
    lon = (xp.cast("double") + F.lit(0.5)) / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    yf = (yp.cast("double") + F.lit(0.5)) / F.lit(n)
    lat = tiles._merc_lat(yf)
    return sparse.select(
        "tile_x",
        "tile_y",
        "px",
        "py",
        lat.alias("lat"),
        lon.alias("lon"),
        "n",
    )


def vectorize_sql(z: int, res_bits: int, sparse_cte: str) -> str:
    """DuckDB twin of :func:`vectorize` over a CTE named ``sparse_cte``
    with columns (tile_x, tile_y, px, py, n); centers quantized by the
    caller."""
    zp = z + res_bits
    n = float(1 << zp)
    xp = f"((tile_x << {res_bits}) + px)"
    yp = f"((tile_y << {res_bits}) + py)"
    lon = f"((CAST({xp} AS DOUBLE) + 0.5) / {n!r} * 360.0 - 180.0)"
    yf = f"((CAST({yp} AS DOUBLE) + 0.5) / {n!r})"
    lat = tiles._merc_lat_sql(yf)
    return (
        f"SELECT tile_x, tile_y, px, py, {lat} AS lat, {lon} AS lon, n "
        f"FROM {sparse_cte}"
    )
