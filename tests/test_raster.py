"""Raster <-> vector round-trip properties (geo/raster.py).

Fixture properties (reference tile semantics, bounds.go:18-34):
- conservation: sum of raster counts == input point count, at every
  representation (sparse, dense, re-extracted sparse, vector);
- pixel identity: re-tiling a vectorized pixel centroid at the pixel
  zoom reproduces exactly the pixel's global (x, y) — the centroid is
  strictly inside its pixel cell;
- dense/sparse round trip is lossless.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from osm_spark.geo import raster as R
from osm_spark.geo import tiles

Z, BITS = 5, 3  # z5 tiles, 8x8 rasters (pixels = z8 tiles)


@pytest.fixture(scope="module")
def pts(spark):
    # deterministic scatter incl. duplicates and tile-corner-ish values
    rows = [
        (i, ((i * 7919) % 170000) / 1000.0 - 85.0, ((i * 104729) % 360000) / 1000.0 - 180.0)
        for i in range(500)
    ] + [(1000 + i, 40.712, -74.006) for i in range(25)]  # hot pixel
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_sparse_conservation(pts):
    sparse = R.rasterize_sparse(pts, Z, BITS)
    assert sparse.agg(F.sum("n")).first()[0] == pts.count()
    # pixel indices stay inside the tile-local grid
    res = 1 << BITS
    bad = sparse.where(
        (F.col("px") < 0) | (F.col("px") >= res) | (F.col("py") < 0) | (F.col("py") >= res)
    )
    assert bad.count() == 0


def test_dense_roundtrip_lossless(pts):
    sparse = R.rasterize_sparse(pts, Z, BITS)
    dense = R.rasterize_dense(sparse, BITS)
    res = 1 << BITS
    # every grid has exactly res*res cells
    assert dense.where(F.size("grid") != res * res).count() == 0
    back = R.dense_to_sparse(dense, BITS)
    a = {tuple(r) for r in sparse.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_vectorize_pixel_identity(pts):
    """Centroid of each nonzero pixel re-tiles to the same pixel."""
    sparse = R.rasterize_sparse(pts, Z, BITS)
    vec = R.vectorize(sparse, Z, BITS)
    zp = Z + BITS
    redo = vec.select(
        "tile_x",
        "tile_y",
        "px",
        "py",
        tiles.tile_x("lon", zp).alias("rx"),
        tiles.tile_y("lat", zp).alias("ry"),
    )
    mismatch = redo.where(
        (F.shiftleft("tile_x", BITS) + F.col("px") != F.col("rx"))
        | (F.shiftleft("tile_y", BITS) + F.col("py") != F.col("ry"))
    )
    assert mismatch.count() == 0


def test_hot_pixel_bounded_group(pts):
    """The 25-point hot spot collapses to ONE sparse row (n=25) before
    the dense fill — applyInPandas group size is pixel-bounded."""
    sparse = R.rasterize_sparse(pts, Z, BITS)
    hot = sparse.where(F.col("n") >= 25).collect()
    assert len(hot) == 1 and hot[0]["n"] == 25
