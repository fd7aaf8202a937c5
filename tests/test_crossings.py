"""Segment-intersection join (geo/crossings.py) vs a brute-force
integer mirror, plus the degenerate-geometry contract (shared
endpoints, T-touches and collinear overlaps are NOT crossings)."""

import random

from osm_spark.geo.crossings import segment_crossings


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _opp(a, b):
    return (a > 0 and b < 0) or (a < 0 and b > 0)


def _brute(segs):
    out = set()
    for i, (ia, ax1, ay1, ax2, ay2) in enumerate(segs):
        for ib, bx1, by1, bx2, by2 in segs[i + 1:]:
            d1 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = _cross(bx1, by1, bx2, by2, ax1, ay1)
            d4 = _cross(bx1, by1, bx2, by2, ax2, ay2)
            if _opp(d1, d2) and _opp(d3, d4):
                out.add((min(ia, ib), max(ia, ib)))
    return out


def _run(spark, segs, cell_bits=20):
    df = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        (r.seg_a, r.seg_b)
        for r in segment_crossings(df, cell_bits=cell_bits).collect()
    }
    return got


def test_matches_bruteforce_random(spark):
    rng = random.Random(42)
    segs = []
    for i in range(300):
        x = rng.randrange(0, 30_000_000)
        y = rng.randrange(0, 15_000_000)
        segs.append((
            i, x, y,
            x + rng.randrange(-900_000, 900_001),
            y + rng.randrange(-900_000, 900_001),
        ))
    want = _brute(segs)
    assert _run(spark, segs) == want
    assert len(want) > 10  # the fixture genuinely crosses


def test_degenerate_contract(spark):
    segs = [
        # 0 x 1: proper crossing
        (0, 0, 0, 10, 10),
        (1, 0, 10, 10, 0),
        # 2-3 share an endpoint (legal junction): excluded
        (2, 100, 100, 200, 200),
        (3, 200, 200, 300, 100),
        # 4 T-touches 5 (endpoint strictly inside 5): excluded
        (4, 450, 400, 450, 500),
        (5, 400, 500, 500, 500),
        # 6-7 collinear overlap: excluded
        (6, 600, 600, 700, 700),
        (7, 650, 650, 750, 750),
        # 8 zero-length on 9's interior: excluded
        (8, 850, 850, 850, 850),
        (9, 800, 800, 900, 900),
    ]
    assert _run(spark, segs, cell_bits=6) == {(0, 1)}


def test_pair_once_across_shared_cells(spark):
    # long diagonals sharing many cells still emit the pair once
    segs = [
        (0, 0, 0, 4_000_000, 4_000_000),
        (1, 0, 4_000_000, 4_000_000, 0),
    ]
    assert _run(spark, segs, cell_bits=18) == {(0, 1)}
