"""Property tests for the aperture-7 hex index (geo/hex.py).

Mirrors test_tiles.py's neighborhood/hierarchy properties on the hex
grid: encode/decode roundtrips, digit-chain vs closed-form parent
agreement, k-ring size/adjacency, and the numpy-vs-SQL twin parity
that the driver oracle depends on.
"""

import duckdb
import numpy as np
import pytest

from osm_spark.geo import hex as H


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85.0, 85.0, 5000)
    lon = rng.uniform(-180.0, 180.0, 5000)
    return lat, lon


@pytest.mark.parametrize("res", [0, 1, 2, 3, 5, 7, 10])
def test_encode_decode_roundtrip(pts, res):
    lat, lon = pts
    cell = H.latlon_to_cell(lat, lon, res)
    r2, q2, rr2 = H.cell_to_axial(cell)
    q1, r1 = H.latlon_to_axial(lat, lon, res)
    assert (r2 == res).all()
    assert (q1 == q2).all() and (r1 == rr2).all()
    assert (H.axial_to_cell(q2, rr2, res) == cell).all()


def test_mode_and_res_bits(pts):
    lat, lon = pts
    for res in (0, 4, 10):
        cell = H.latlon_to_cell(lat, lon, res)
        assert ((cell >> 59) == 1).all()  # mode bits
        assert (cell > 0).all()  # sign bit clear
        assert (H.cell_res(cell) == res).all()


def test_parent_truncation_matches_float_parent(pts):
    lat, lon = pts
    cell = H.latlon_to_cell(lat, lon, 6)
    for parent_res in (5, 3, 0):
        p = H.cell_to_parent(cell, parent_res)
        pres, pq, pr = H.cell_to_axial(p)
        assert (pres == parent_res).all()
        # walk the float parent chain from res 6 axial
        _, q, r = H.cell_to_axial(cell)
        for _ in range(6 - parent_res):
            q, r = H._parent_axial(q, r)
        assert (pq == q).all() and (pr == r).all()


def test_children_invert_parent(pts):
    lat, lon = pts
    cell = H.latlon_to_cell(lat[:50], lon[:50], 4)
    for c in cell[:20]:
        kids = H.cell_to_children(int(c))
        assert len(set(kids.tolist())) == 7
        assert (H.cell_to_parent(kids, 4) == c).all()
        # children's axial coords are the M-image + coset offsets
        _, cq, cr = H.cell_to_axial(np.array([c]))
        _, kq, kr = H.cell_to_axial(kids)
        assert sorted(zip((kq - (2 * cq[0] - cr[0])).tolist(),
                          (kr - (cq[0] + 3 * cr[0])).tolist())) == sorted(H.DIGITS)


@pytest.mark.parametrize("k", [0, 1, 2, 3, 5])
def test_kring_size_and_distance(pts, k):
    lat, lon = pts
    c = int(H.latlon_to_cell(lat[:1], lon[:1], 6)[0])
    ring = H.k_ring(c, k)
    assert len(ring) == 1 + 3 * k * (k + 1)
    assert len(set(ring.tolist())) == len(ring)
    _, cq, cr = H.cell_to_axial(np.array([c]))
    _, rq, rr = H.cell_to_axial(ring)
    d = H.hex_distance(rq, rr, cq[0], cr[0])
    assert d.max() == k or k == 0
    assert (d <= k).all()


def test_kring_symmetry(pts):
    # b in k_ring(a) <=> a in k_ring(b)
    lat, lon = pts
    cells = H.latlon_to_cell(lat[:20], lon[:20], 3)
    a = int(cells[0])
    for b in H.k_ring(a, 2):
        assert a in set(H.k_ring(int(b), 2).tolist())


def test_point_center_same_cell(pts):
    lat, lon = pts
    for res in (2, 7):
        cell = H.latlon_to_cell(lat, lon, res)
        clat, clon = H.cell_center(cell)
        assert (H.latlon_to_cell(clat, clon, res) == cell).all()


def test_sql_twin_parity(pts):
    """The oracle contract: numpy kernel == DuckDB closed form, bit for
    bit, for encode AND parent."""
    lat, lon = pts
    import pandas as pd

    con = duckdb.connect()
    con.register("pin", pd.DataFrame({"lat": lat[:800], "lon": lon[:800]}))
    con.execute("CREATE TABLE p AS SELECT lat, lon FROM pin")
    for res in (1, 4, 9):
        qs, rs = H.axial_sql("lat", "lon", res)
        df = con.execute(f"SELECT {qs} AS q, {rs} AS r FROM p").fetchdf()
        q, r = H.latlon_to_axial(lat[:800], lon[:800], res)
        assert (df["q"].to_numpy() == q).all()
        assert (df["r"].to_numpy() == r).all()
        pq_s, pr_s = H.parent_axial_sql("q", "r")
        pdf = con.execute(
            f"WITH ax AS (SELECT {qs} AS q, {rs} AS r FROM p) "
            f"SELECT {pq_s} AS pq, {pr_s} AS pr FROM ax"
        ).fetchdf()
        eq, er = H._parent_axial(q, r)
        assert (pdf["pq"].to_numpy() == eq).all()
        assert (pdf["pr"].to_numpy() == er).all()


def test_aperture7_partition():
    """Every integer axial coord belongs to exactly one parent, and each
    parent owns exactly 7 fine cells (the aperture)."""
    span = np.arange(-20, 21)
    q, r = np.meshgrid(span, span)
    q, r = q.ravel(), r.ravel()
    pq, pr = H._parent_axial(q, r)
    dq = q - (2 * pq - pr)
    dr = r - (pq + 3 * pr)
    # residuals all in the coset table
    assert set(zip(dq.tolist(), dr.tolist())) <= set(H.DIGITS)
    # interior parents own exactly 7 children
    from collections import Counter

    counts = Counter(zip(pq.tolist(), pr.tolist()))
    interior = [v for (a, b), v in counts.items() if abs(a) <= 4 and abs(b) <= 4]
    assert interior and all(v == 7 for v in interior)
