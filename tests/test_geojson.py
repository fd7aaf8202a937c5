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


# ---- option surface, pinned to the reference's options tests ----------
# (osmgeojson/options.go:7-31, options_test.go:73-147: for each element
# type, the default emission carries feature.id / properties.meta /
# properties.relations; NoID(true) drops the feature id, NoMeta(true)
# drops meta, NoRelationMembership(true) drops relations — each toggle
# independent of the others.)

# the three options_test.go fixtures: element id=1 with full meta,
# referenced by relation 1 with role "roo"
_OPT_META = {"version": 7, "changeset": 1234, "user": "johndoe",
             "uid": 123, "ts": "2013-01-13T22:56:07Z"}
_OPT_RELS = [{"rel_id": 1, "role": "roo", "tags": {}}]


def _opt_features():
    node = GJ.node_feature(
        {"id": 1, "lat": 1.234, "lon": 4.321, **_OPT_META},
        GJ.relation_summaries(_OPT_RELS),
    )
    way = GJ.way_feature(
        {"id": 1, **_OPT_META}, [(1.0, 1.0), (2.0, 2.0)], False, False,
        GJ.relation_summaries(_OPT_RELS),
    )
    rel = GJ.relation_feature(
        {"id": 1, "tags": {"type": "multipolygon"}, **_OPT_META},
        {"type": "Polygon",
         "coordinates": [[[1, 1], [2, 2], [3, 3], [1, 1]]]},
        GJ.relation_summaries(_OPT_RELS),
    )
    return {"node": node, "way": way, "relation": rel}


def _opt_features_with(**opts):
    node = GJ.node_feature(
        {"id": 1, "lat": 1.234, "lon": 4.321, **_OPT_META},
        GJ.relation_summaries(_OPT_RELS), **opts,
    )
    way = GJ.way_feature(
        {"id": 1, **_OPT_META}, [(1.0, 1.0), (2.0, 2.0)], False, False,
        GJ.relation_summaries(_OPT_RELS), **opts,
    )
    rel = GJ.relation_feature(
        {"id": 1, "tags": {"type": "multipolygon"}, **_OPT_META},
        {"type": "Polygon",
         "coordinates": [[[1, 1], [2, 2], [3, 3], [1, 1]]]},
        GJ.relation_summaries(_OPT_RELS), **opts,
    )
    return {"node": node, "way": way, "relation": rel}


def test_option_default_emission():
    """options_test.go defaults: id set, meta set, relations set."""
    for etype, f in _opt_features().items():
        assert f["id"] == f"{etype}/1"
        assert f["properties"]["meta"] == {
            "timestamp": "2013-01-13T22:56:07Z", "version": 7,
            "changeset": 1234, "user": "johndoe", "uid": 123,
        }
        assert f["properties"]["relations"] == [
            {"id": 1, "role": "roo", "tags": {}}
        ]


def test_option_no_id():
    """TestOptionNoID (options_test.go:73-97): feature id nil, the
    other properties untouched."""
    for etype, f in _opt_features_with(no_id=True).items():
        assert "id" not in f, etype
        assert f["properties"]["id"] == 1  # numeric property id stays
        assert "meta" in f["properties"]
        assert "relations" in f["properties"]


def test_option_no_meta():
    """TestOptionNoMeta (options_test.go:99-123)."""
    for etype, f in _opt_features_with(no_meta=True).items():
        assert "meta" not in f["properties"], etype
        assert f["id"] == f"{etype}/1"
        assert "relations" in f["properties"]


def test_option_no_relation_membership():
    """TestOptionNoRelationMembership (options_test.go:125-149)."""
    for etype, f in _opt_features_with(no_rel=True).items():
        assert "relations" not in f["properties"], etype
        assert f["id"] == f"{etype}/1"
        assert "meta" in f["properties"]


def test_option_all_off_spark_path(spark):
    """The NoID+NoMeta+NoRelationMembership combination through the
    distributed emitters (benchmarks_test.go:77-84
    BenchmarkConvert_NoIDsMetaMembership shape)."""
    nodes = spark.createDataFrame(
        [(1, 1.234, 4.321, 7, 1234, "2013-01-13T22:56:07Z", "johndoe",
          123, {"amenity": "pub"})],
        "id long, lat double, lon double, version int, changeset long,"
        " ts string, user string, uid long, tags map<string,string>",
    )
    mem = spark.createDataFrame(
        [(1, 1, "roo", {})],
        "ref long, rel_id long, role string, tags map<string,string>",
    )
    f = json.loads(
        GJ.node_features_df(
            nodes, mem, no_id=True, no_meta=True, no_rel=True
        ).collect()[0].feature
    )
    assert "id" not in f
    assert "meta" not in f["properties"]
    assert "relations" not in f["properties"]
    assert f["properties"]["tags"] == {"amenity": "pub"}
    # default through the same path keeps all three
    f2 = json.loads(GJ.node_features_df(nodes, mem).collect()[0].feature)
    assert f2["id"] == "node/1"
    assert f2["properties"]["relations"] == [
        {"id": 1, "role": "roo", "tags": {}}
    ]
    assert f2["properties"]["meta"]["user"] == "johndoe"

    ways = spark.createDataFrame(
        [(1, [(1.0, 1.0), (2.0, 2.0)], False, False, 7, 1234,
          {"highway": "x"})],
        "id long, line array<struct<lon:double,lat:double>>,"
        " is_polygon boolean, tainted boolean, version int,"
        " changeset long, tags map<string,string>",
    )
    wmem = spark.createDataFrame(
        [(1, 1, "roo", {})],
        "ref long, rel_id long, role string, tags map<string,string>",
    )
    wf = json.loads(
        GJ.way_features_df(
            ways, wmem, no_id=True, no_meta=True, no_rel=True
        ).collect()[0].feature
    )
    assert "id" not in wf
    assert "meta" not in wf["properties"]
    assert "relations" not in wf["properties"]
