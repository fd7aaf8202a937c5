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


def test_candidate_work_is_perimeter_bounded(spark):
    """The frontier recursion's CANDIDATE generation (not just its
    output) must be O(perimeter at z_max): an elongated z12 bbox whose
    per-zoom full-rectangle enumeration would be ~10x larger stays
    within a small constant of the boundary-tile count."""
    import math

    from osm_spark.geo.covering import covering_candidate_counts

    z_min, z_max = 4, 12

    def tx(lon, z):
        return min((1 << z) - 1, max(0, int((lon + 180.0) / 360.0 * (1 << z))))

    def ty(lat, z):
        s = math.sin(math.radians(lat))
        y = 0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)
        return min((1 << z) - 1, max(0, int(y * (1 << z))))

    def grid_total(rect):
        # what the old per-zoom sequence-explode generated
        _, xmin, xmax, ymin, ymax = rect
        return sum(
            (tx(xmax, z) - tx(xmin, z) + 1) * (ty(ymin, z) - ty(ymax, z) + 1)
            for z in range(z_min, z_max + 1)
        )

    def perimeter(rect):
        _, xmin, xmax, ymin, ymax = rect
        px = tx(xmax, z_max) - tx(xmin, z_max) + 1
        py = ty(ymin, z_max) - ty(ymax, z_max) + 1
        return 2 * (px + py)

    def total_cand(rect):
        counts = covering_candidate_counts(
            _rects(spark, [rect]), z_min, z_max
        )
        return sum(n for _, n in counts)

    # thin strip: everything is boundary — candidates still track the
    # z_max perimeter (geometric series of frontier lengths x 4 kids)
    strip = (1, -170.0, 170.0, -0.3, 0.3)
    cand_strip = total_cand(strip)
    assert cand_strip <= 6 * perimeter(strip) + 4 ** (z_min + 1), (
        cand_strip,
        perimeter(strip),
    )

    # large-area bbox: the grid enumeration is O(area at z_max); the
    # frontier recursion must beat it by >10x AND stay perimeter-bound
    big = (2, -60.0, 60.0, -45.0, 45.0)
    cand_big = total_cand(big)
    assert cand_big < grid_total(big) / 10, (cand_big, grid_total(big))
    assert cand_big <= 6 * perimeter(big) + 4 ** (z_min + 1), (
        cand_big,
        perimeter(big),
    )


def test_polygon_covering_beats_bbox_cover(spark):
    """A triangle's TRUE covering must be smaller than its bbox's
    adaptive covering (exterior corner drops out), and its z_max
    expansion must be a subset of the bbox cover's expansion."""
    from osm_spark.geo import wkb as W
    from osm_spark.geo.covering import polygon_covering

    z_min, z_max = 3, 8
    x0, x1, y0, y1 = -10.0005, 40.0005, -5.0005, 25.0005
    tri_wkb = W.encode_polygon([([x0, x1, x0, x0], [y0, y0, y1, y0])])
    tri = spark.createDataFrame(
        [(1, x0, x1, y0, y1, bytearray(tri_wkb))],
        "poly_id long, xmin double, xmax double, ymin double,"
        " ymax double, wkb binary",
    )
    bbox = tri.drop("wkb")

    tcov = polygon_covering(tri, z_min, z_max).collect()
    bcov = adaptive_covering(bbox, z_min, z_max).collect()

    def expand(rows):
        cells = set()
        for r in rows:
            d = z_max - r.zoom
            for dx in range(1 << d):
                for dy in range(1 << d):
                    cells.add(
                        ((r.tile_x << d) + dx, (r.tile_y << d) + dy)
                    )
        return cells

    t_cells, b_cells = expand(tcov), expand(bcov)
    assert t_cells < b_cells  # strict subset: corners dropped
    # the triangle is ~half the bbox: the covered area must shrink
    # materially, not marginally
    assert len(t_cells) < 0.75 * len(b_cells), (len(t_cells), len(b_cells))
    # multi-zoom disjointness: no cell's ancestor also in the covering
    seen = {(r.zoom, r.tile_x, r.tile_y) for r in tcov}
    for r in tcov:
        for zp in range(z_min, r.zoom):
            d = r.zoom - zp
            assert (zp, r.tile_x >> d, r.tile_y >> d) not in seen


def test_pip_polygon_covering_matches_bruteforce(spark):
    """The interior/boundary-split PIP join must return exactly the
    brute-force ray-cast result for a triangle with a hole (the FULL
    cells skip refine — any covering error would leak points)."""
    import numpy as np

    from osm_spark.geo import wkb as W
    from osm_spark.geo.pip import pip_join_polygon_covering, ring_contains

    outer = ([-10.0005, 30.0005, -10.0005, -10.0005],
             [-8.0005, -8.0005, 22.0005, -8.0005])
    hole = ([2.0005, 8.0005, 8.0005, 2.0005, 2.0005],
            [1.0005, 1.0005, 6.0005, 6.0005, 1.0005])
    wkb = W.encode_polygon([outer, hole])
    polys = spark.createDataFrame(
        [(1, -10.0005, 30.0005, -8.0005, 22.0005, bytearray(wkb))],
        "poly_id long, xmin double, xmax double, ymin double,"
        " ymax double, wkb binary",
    )
    # deterministic point cloud crossing interior, hole, and exterior
    pts_rows = [
        (i, ((i * 37) % 500) / 10.0 - 15.0, ((i * 53) % 400) / 10.0 - 12.0)
        for i in range(800)
    ]
    pts = spark.createDataFrame(pts_rows, "doc_id long, lon double, lat double")

    got = {
        (r.doc_id, r.poly_id)
        for r in pip_join_polygon_covering(pts, polys, 3, 8).collect()
    }
    px = np.array([p[1] for p in pts_rows])
    py = np.array([p[2] for p in pts_rows])
    inside = np.zeros(len(pts_rows), dtype=bool)
    for xs, ys in (outer, hole):
        inside ^= ring_contains(
            np.asarray(xs), np.asarray(ys), px, py
        )
    want = {(pts_rows[i][0], 1) for i in np.nonzero(inside)[0]}
    assert got == want
