"""Adaptive covering properties: exact coverage equivalence with the
fixed-zoom covering, disjointness of the multi-zoom cells, and the
cell-count reduction that motivates it."""

from pyspark.sql import functions as F

from osm_spark.geo.covering import adaptive_covering


def _rects(spark, rows):
    return spark.createDataFrame(
        rows, "poly_id long, xmin double, xmax double, ymin double, ymax double"
    )


RECTS = [
    (1, -10.0, 60.0, -3.0, 4.0),     # elongated east-west
    (2, 5.2, 6.1, 5.2, 6.1),         # small
    (3, -170.0, 170.0, -60.0, 70.0), # near-global
]


def test_adaptive_equals_fixed_at_zmax(spark):
    """Expanding every adaptive cell to its z_max descendants must give
    exactly the intersecting z_max tile set (no gap, no spill)."""
    z_min, z_max = 3, 7
    cov = adaptive_covering(_rects(spark, RECTS), z_min, z_max).collect()
    from osm_spark.geo import tiles

    fixed = (
        _rects(spark, RECTS)
        .withColumn(
            "tile_x",
            F.explode(F.sequence(tiles.tile_x("xmin", z_max), tiles.tile_x("xmax", z_max))),
        )
        .withColumn(
            "tile_y",
            F.explode(F.sequence(tiles.tile_y("ymax", z_max), tiles.tile_y("ymin", z_max))),
        )
        .select("poly_id", "tile_x", "tile_y")
        .collect()
    )
    want = {(r["poly_id"], r["tile_x"], r["tile_y"]) for r in fixed}
    got = set()
    for r in cov:
        d = z_max - r["zoom"]
        for dx in range(1 << d):
            for dy in range(1 << d):
                got.add(
                    (r["poly_id"], (r["tile_x"] << d) + dx, (r["tile_y"] << d) + dy)
                )
    # adaptive covering may omit boundary-touching-only tiles that the
    # closed bbox range includes but that don't strictly intersect; it
    # must never SPILL outside, and must cover every strictly
    # intersecting tile — for these rects (no boundary alignment) the
    # sets are exactly equal
    assert got == want


def test_no_ancestor_in_covering(spark):
    cov = adaptive_covering(_rects(spark, RECTS), 3, 7).collect()
    cells = {(r["poly_id"], r["zoom"], r["tile_x"], r["tile_y"]) for r in cov}
    for pid, z, x, y in cells:
        for zp in range(3, z):
            assert (pid, zp, x >> (z - zp), y >> (z - zp)) not in cells


def test_cell_count_reduction(spark):
    """The motivating claim: adaptive covering is much smaller than the
    fixed z_max covering for large/elongated regions."""
    z_max = 10
    cov = adaptive_covering(_rects(spark, RECTS[:1]), 3, z_max)
    from osm_spark.geo import tiles

    n_adaptive = cov.count()
    r = RECTS[0]
    fixed = (
        _rects(spark, [r])
        .select(
            (tiles.tile_x("xmax", z_max) - tiles.tile_x("xmin", z_max) + 1)
            * (tiles.tile_y("ymin", z_max) - tiles.tile_y("ymax", z_max) + 1)
        )
        .collect()[0][0]
    )
    assert n_adaptive < fixed / 3, (n_adaptive, fixed)
