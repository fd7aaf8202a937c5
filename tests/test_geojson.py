"""GeoJSON feature fixtures ported from the reference
(osmgeojson/convert_test.go:14-80 and related cases)."""

import json

from osm_spark.functions import geojson as GJ


def test_node_feature_fixture():
    # convert_test.go "node": <node id='1' lat='1.234' lon='4.321' />
    f = GJ.node_feature({"id": 1, "lat": 1.234, "lon": 4.321})
    assert f["id"] == "node/1"
    assert f["geometry"] == {"type": "Point", "coordinates": [4.321, 1.234]}
    assert f["properties"]["type"] == "node"
    assert f["properties"]["id"] == 1
    assert f["properties"]["tags"] == {}
    assert f["properties"]["relations"] == []
    assert f["properties"]["meta"] == {}  # all-zero meta -> empty


def test_empty_node_skipped():
    # convert.go:166-169: lat==lon==0 and version==0 -> nil
    assert GJ.node_feature({"id": 9, "lat": 0.0, "lon": 0.0}) is None
    assert GJ.node_feature({"id": 9, "lat": 0.0, "lon": 0.0, "version": 2}) is not None


def test_meta_zero_omission():
    f = GJ.node_feature(
        {"id": 2, "lat": 1.0, "lon": 2.0, "version": 3, "changeset": 0,
         "user": "", "uid": 7}
    )
    meta = f["properties"]["meta"]
    assert meta == {"version": 3, "uid": 7}  # changeset 0 / empty user omitted


def test_way_linestring_fixture():
    # convert_test.go "way": nodes (1,0) (1.1,0) (1.2,0.1)
    line = [(1.0, 0.0), (1.1, 0.0), (1.2, 0.1)]
    f = GJ.way_feature({"id": 1, "tags": {}}, line, is_polygon=False, tainted=False)
    assert f["id"] == "way/1"
    assert f["geometry"]["type"] == "LineString"
    assert f["geometry"]["coordinates"] == [[1.0, 0.0], [1.1, 0.0], [1.2, 0.1]]
    assert "tainted" not in f["properties"]


def test_one_node_way_skipped():
    assert GJ.way_feature({"id": 1}, [(1.0, 2.0)], False, False) is None


def test_polygon_way_closed_and_reoriented():
    # CW square ring must come back CCW-closed (convert.go reorient)
    line = [(-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)]
    f = GJ.way_feature(
        {"id": 2, "tags": {"area": "yes"}}, line, is_polygon=True, tainted=False
    )
    ring = f["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    from osm_spark.geo.pip import ring_orientation

    assert ring_orientation(xs, ys) > 0  # CCW


def test_tainted_flag():
    line = [(0.0, 0.0), (1.0, 1.0)]
    f = GJ.way_feature({"id": 3}, line, False, tainted=True)
    assert f["properties"]["tainted"] is True


def test_relation_summary_shape():
    # convert_test.go "simple relation polygon": relations property
    rels = GJ.relation_summaries(
        [{"rel_id": 1, "role": "outer", "tags": {"type": "multipolygon"}}]
    )
    assert rels == [{"id": 1, "role": "outer", "tags": {"type": "multipolygon"}}]
    f = GJ.node_feature({"id": 4, "lat": 1.0, "lon": 1.0}, rels)
    assert f["properties"]["relations"] == rels


def test_canonical_json_deterministic():
    f = GJ.node_feature({"id": 1, "lat": 1.0, "lon": 2.0, "tags": {"b": "2", "a": "1"}})
    s = GJ.feature_json(f)
    assert s == GJ.feature_json(json.loads(s))  # stable under re-serialize
    assert '"a":"1","b":"2"' in s  # sorted keys, compact
