"""Hypothesis property tests for the pure kernels (no Spark session):
hex index, WKB codec, tile math, GeoJSON emission."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_spark.geo import hex as H
from osm_spark.geo import wkb as W

lat_s = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
res_s = st.integers(min_value=0, max_value=10)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, res_s)
def test_hex_encode_decode_roundtrip(lat, lon, res):
    cell = H.latlon_to_cell(np.array([lat]), np.array([lon]), res)
    r, q, rr = H.cell_to_axial(cell)
    assert int(r[0]) == res
    q2, r2 = H.latlon_to_axial(np.array([lat]), np.array([lon]), res)
    assert int(q[0]) == int(q2[0]) and int(rr[0]) == int(r2[0])
    assert int(H.axial_to_cell(q, rr, res)[0]) == int(cell[0])


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=1, max_value=10))
def test_hex_parent_contains_point(lat, lon, res):
    """The parent of the point's cell at res is the point's... NOT
    necessarily its closed-form cell at res-1 (aperture-7 children
    straddle parents), but the digit-chain parent must equal the
    hexround walk from the child."""
    la, lo = np.array([lat]), np.array([lon])
    cell = H.latlon_to_cell(la, lo, res)
    par = H.cell_to_parent(cell, res - 1)
    _, q, r = H.cell_to_axial(cell)
    eq, er = H._parent_axial(q, r)
    _, pq, pr = H.cell_to_axial(par)
    assert int(pq[0]) == int(eq[0]) and int(pr[0]) == int(er[0])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(lon_s, lat_s), min_size=3, max_size=60),
    st.sampled_from([W.POLYGON, W.LINESTRING]),
)
def test_wkb_roundtrip_bit_exact(pts, gtype):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    if gtype == W.POLYGON:
        buf = W.encode_polygon([(xs, ys)])
        expected_len = 9 + 4 + 16 * len(xs)
    else:
        buf = W.encode_linestring(xs, ys)
        expected_len = 9 + 16 * len(xs)
    assert len(buf) == expected_len
    gt, rings = W.decode(buf)
    assert gt == gtype
    np.testing.assert_array_equal(rings[0][0], xs)
    np.testing.assert_array_equal(rings[0][1], ys)


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=0, max_value=18))
def test_tile_fraction_floor_in_range(lat, lon, z):
    """Driver-side tile math (cells._tile_xy) stays in [0, 2^z)."""
    from osm_spark.geo.cells import _tile_xy

    x, y = _tile_xy(lat, lon, z)
    n = 1 << z
    assert 0 <= x < n and 0 <= y < n


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**40), max_value=2**40), lat_s, lon_s)
def test_geojson_node_feature_total(nid, lat, lon):
    """node_feature never crashes, skips only the defined empty case,
    and always emits well-formed canonical JSON."""
    import json

    from osm_spark.functions import geojson as GJ

    f = GJ.node_feature({"id": nid, "lat": lat, "lon": lon})
    if lat == 0.0 and lon == 0.0:
        assert f is None
        return
    s = GJ.feature_json(f)
    back = json.loads(s)
    assert back["properties"]["id"] == nid
    assert back["geometry"]["coordinates"] == [lon, lat]
