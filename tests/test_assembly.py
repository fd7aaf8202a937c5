"""Segment join / ring / multipolygon assembly — cases ported from
reference internal/mputil/join_test.go and osmgeojson/build_polygon.go
semantics. Pure-Python kernels (no Spark needed here)."""

from osm_spark.geom import assembly as A


def seg(*pts, orientation=0):
    return A.Segment([tuple(p) for p in pts], orientation=orientation)


def lines(groups):
    return [[s.line for s in ms] for ms in groups]


def test_join_single_line():
    out = A.join_segments([seg((0, 0), (1, 1))])
    assert lines(out) == [[[(0, 0), (1, 1)]]]


def test_join_two_loops():
    out = A.join_segments(
        [
            seg((0, 0), (1, 1), (1, 2), (0, 0)),
            seg((1, 0), (2, 1), (2, 2), (1, 0)),
        ]
    )
    # join.go starts from the END of the list
    assert lines(out) == [
        [[(1, 0), (2, 1), (2, 2), (1, 0)]],
        [[(0, 0), (1, 1), (1, 2), (0, 0)]],
    ]


def test_join_two_lines():
    out = A.join_segments([seg((0, 0), (1, 1)), seg((1, 1), (2, 2))])
    assert lines(out) == [[[(0, 0)], [(1, 1), (2, 2)]]]


def test_join_two_lines_reverse_order():
    out = A.join_segments([seg((1, 1), (2, 2)), seg((0, 0), (1, 1))])
    assert lines(out) == [[[(0, 0), (1, 1)], [(2, 2)]]]


def test_join_two_lines_with_reverse():
    out = A.join_segments([seg((2, 2), (1, 1)), seg((2, 2), (3, 3))])
    assert lines(out) == [[[(1, 1)], [(2, 2), (3, 3)]]]
    assert out[0][0].reversed is True


def test_join_reverse_second():
    out = A.join_segments([seg((0, 0), (1, 1)), seg((2, 2), (1, 1))])
    assert lines(out) == [[[(2, 2), (1, 1)], [(0, 0)]]]
    assert out[0][1].reversed is True


def test_join_single_point_segments_compacted():
    """join.go:82-94: <=1-point segments dropped before joining."""
    out = A.join_segments([seg((5, 5)), seg((0, 0), (1, 1)), seg()])
    assert lines(out) == [[[(0, 0), (1, 1)]]]


def test_join_dangling_line():
    out = A.join_segments([seg((0, 0), (1, 1)), seg((5, 5), (6, 6))])
    assert len(out) == 2


def test_ring_orientation_and_reversal():
    ccw = [seg((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))]
    assert A.multi_segment_orientation(ccw) == A.CCW
    r = A.multi_segment_ring(ccw, A.CW)
    assert r[0] == (0, 0) and r[1] == (0, 1)  # got reversed
    r2 = A.multi_segment_ring(ccw, A.CCW)
    assert r2 == ccw[0].line


def test_ring_uses_member_orientation():
    """mputil.go:79-96: member orientation annotation short-circuits the
    computed orientation."""
    s = seg((0, 0), (1, 0), (1, 1), (0, 1), (0, 0), orientation=A.CCW)
    # annotated CCW, not reversed, want CCW -> (o==want)==reversed is
    # False -> no flip
    assert A.multi_segment_ring([s], A.CCW) == s.line
    # want CW: (o==want)=False == reversed False -> reversed_flag True -> flip
    assert A.multi_segment_ring([s], A.CW) == s.line[::-1]


def test_build_multipolygon_old_style():
    """Single outer way, tags on the way (build_polygon.go:99-124)."""
    members = [
        {"type": "way", "ref": 1, "role": "outer", "orientation": 0},
        {"type": "way", "ref": 2, "role": "inner", "orientation": 0},
    ]
    way_lines = {
        1: [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
        2: [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)],
    }
    out = A.build_multipolygon(members, way_lines)
    assert out["old_style"] is True
    assert not out["tainted"]
    assert len(out["polygons"]) == 1
    poly = out["polygons"][0]
    assert len(poly) == 2
    assert A._ring_orientation_pts(poly[0]) == A.CCW
    assert A._ring_orientation_pts(poly[1]) == A.CW


def test_build_multipolygon_multi_outer_pip_assignment():
    """Two outers; inner assigned to its containing outer via ray-cast."""
    members = [
        {"type": "way", "ref": 1, "role": "outer"},
        {"type": "way", "ref": 2, "role": "outer"},
        {"type": "way", "ref": 3, "role": "inner"},
    ]
    way_lines = {
        1: [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
        2: [(10, 10), (14, 10), (14, 14), (10, 14), (10, 10)],
        3: [(11, 11), (12, 11), (12, 12), (11, 12), (11, 11)],
    }
    out = A.build_multipolygon(members, way_lines)
    assert out["old_style"] is False
    polys = out["polygons"]
    assert len(polys) == 2
    with_hole = [p for p in polys if len(p) == 2]
    assert len(with_hole) == 1
    assert with_hole[0][0][0][0] >= 10  # the second outer holds the hole


def test_build_multipolygon_unclosed_outer_skipped():
    members = [
        {"type": "way", "ref": 1, "role": "outer"},
        {"type": "way", "ref": 2, "role": "outer"},
    ]
    way_lines = {
        1: [(0, 0), (4, 0), (4, 4)],  # unclosed, dangling
        2: [(10, 10), (14, 10), (14, 14), (10, 14), (10, 10)],
    }
    out = A.build_multipolygon(members, way_lines)
    assert len(out["polygons"]) == 1


def test_build_multipolygon_missing_way_tainted():
    members = [
        {"type": "way", "ref": 1, "role": "outer"},
        {"type": "way", "ref": 99, "role": "inner"},
    ]
    way_lines = {1: [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]}
    out = A.build_multipolygon(members, way_lines)
    assert out["tainted"] is True


def test_route_linestrings_with_reversal():
    members = [
        {"type": "way", "ref": 1},
        {"type": "way", "ref": 2},  # needs reversal to connect
    ]
    way_lines = {1: [(0, 0), (1, 1)], 2: [(2, 2), (1, 1)]}
    out = A.build_route_linestrings(members, way_lines)
    assert out["lines"] == [[(2, 2), (1, 1), (0, 0)]]
