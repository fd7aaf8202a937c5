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


@given(
    st.lists(
        st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=12),
        min_size=0,
        max_size=20,
    ),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_segmented_varints_matches_per_chunk(chunks, delta):
    """_segmented_varints (one concatenated decode + terminator-bit
    counts + segmented cumsum) is value-identical to decoding each
    chunk separately — including empty chunks, leading empties, and
    per-chunk delta restarts."""
    from osm_spark.sources.pbf import (
        _delta, _packed, _segmented_varints, _unpack_varints,
    )

    def enc(vals):
        if not vals:
            return b""
        body = _packed(1, _delta(vals) if delta else vals, zigzag=True)
        # strip the field tag+len header: keep only the packed payload
        # (re-derive via a reader)
        from osm_spark.sources.pbf import _Reader

        for f, wt, v in _Reader(body).fields():
            return v
        return b""

    parts = [enc(c) for c in chunks]
    vals, counts = _segmented_varints(parts, True, delta)
    # reference: per-chunk decode
    expect = []
    for p, c in zip(parts, chunks):
        got = _unpack_varints(p, True)
        if delta:
            got = np.cumsum(got)
        expect.extend(int(x) for x in got)
        assert len(got) == len(c)
    assert [int(x) for x in vals] == expect
    assert [int(x) for x in counts] == [len(c) for c in chunks]
    # and the decoded values round-trip the originals
    flat = [x for c in chunks for x in c]
    assert [int(x) for x in vals] == flat


@given(
    st.lists(
        st.binary(min_size=0, max_size=3000),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 4),
)
@settings(max_examples=60, deadline=None)
def test_warc_member_walk_adaptive_feed(payloads, nsplits):
    """The adaptive-feed member walk yields every member exactly once
    with byte-identical plaintext and correct consumed sizes, for
    arbitrary payload sizes (tiny members after huge ones stress the
    feed estimator both directions) and any split partition."""
    import gzip
    import io

    from osm_spark.sources.warc import _walk_members_buffered, build_record

    recs = [
        build_record(p, "response", f"http://x/{i}", 1_500_000_000 + i)
        for i, p in enumerate(payloads)
    ]
    members = [gzip.compress(r) for r in recs]
    blob = b"".join(members)
    starts = []
    pos = 0
    for m in members:
        starts.append(pos)
        pos += len(m)

    got = []
    bounds = sorted({0, len(blob)} | {
        starts[(i * len(starts)) // nsplits] for i in range(1, nsplits)
    })
    for s, e in zip(bounds[:-1], bounds[1:]):
        f = io.BytesIO(blob)
        for off, consumed, plain in _walk_members_buffered(f, s, e, 1 << 16):
            got.append((off, consumed, plain))
    got.sort()
    assert [g[0] for g in got] == starts
    assert [g[1] for g in got] == [len(m) for m in members]
    assert [g[2] for g in got] == recs


@given(
    st.lists(st.integers(0, 255), min_size=200, max_size=4000),
    st.integers(64, 4096),
    st.integers(1, 9),
)
@settings(max_examples=40, deadline=None)
def test_bzip2_split_ownership_exactly_once(seed_bytes, split_bytes, level):
    """Splittable bzip2 (sources/bzip2.py): for arbitrary content,
    compression level, and split size, concatenating every task's OWNED
    blocks in file order reproduces the original bytes exactly —
    bit-phase magic discovery, block re-wrap, and range ownership never
    drop or duplicate a block."""
    import bz2
    import os
    import tempfile

    from osm_spark.sources.bzip2 import _iter_task_blocks

    # amplify so level-1 inputs span multiple blocks sometimes, and
    # multistream (two stream headers) is always exercised
    data = bytes(seed_bytes) * 200
    c1 = bz2.BZ2Compressor(1)
    c2 = bz2.BZ2Compressor(level)
    comp = (c1.compress(data) + c1.flush()
            + c2.compress(data[::-1]) + c2.flush())
    fd, path = tempfile.mkstemp(suffix=".bz2")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(comp)
        got = b""
        for start in range(0, len(comp), split_bytes):
            for owned, d in _iter_task_blocks(
                path, start, min(start + split_bytes, len(comp)),
                len(comp), step=1024,
            ):
                if not owned:
                    break
                got += d
        assert got == data + data[::-1]
    finally:
        os.unlink(path)
