"""osmapi source: URL grammar golden-tested against the reference's
fmt.Sprintf formats, fetch+parse through the JVM XML codec with a fake
transport, error taxonomy."""

import pytest

from osm_spark.sources.osmapi import (
    BASE_URL, GoneError, NotFoundError, OsmApiDatasource,
    UnexpectedStatusCodeError, at_param, not_found, raise_for_status,
)


def test_url_grammar_matches_reference(spark):
    ds = OsmApiDatasource(spark)
    b = BASE_URL
    assert b == "http://api.openstreetmap.org/api/0.6"
    # node.go:23 / 49-58 / 79 / 97 / 121
    assert ds.element_url("node", 5) == f"{b}/node/5?"
    assert (
        ds.element_url("node", 5, at="2024-01-02 03:04:05")
        == f"{b}/node/5?at=2024-01-02T03:04:05Z"
    )
    assert ds.elements_url("node", [1, 2, 33]) == f"{b}/nodes?nodes=1,2,33"
    assert ds.element_version_url("node", 5, 7) == f"{b}/node/5/7"
    assert ds.element_history_url("way", 9) == f"{b}/way/9/history"
    assert ds.node_ways_url(4) == f"{b}/node/4/ways?"
    # way.go:125 / 147
    assert ds.element_relations_url("way", 3) == f"{b}/way/3/relations?"
    assert ds.element_full_url("relation", 8) == f"{b}/relation/8/full?"
    # map.go:23-26: %f == 6 fixed decimals, lon-lat order
    assert (
        ds.map_url(-1.5, 2.0, 3.25, 4.125)
        == f"{b}/map?bbox=-1.500000,2.000000,3.250000,4.125000&"
    )
    # changeset.go:18/29/56
    assert ds.changeset_url(12) == f"{b}/changeset/12"
    assert (
        ds.changeset_url(12, include_discussion=True)
        == f"{b}/changeset/12?include_discussion=true"
    )
    assert ds.changeset_download_url(12) == f"{b}/changeset/12/download"
    # note.go:47-61, options.go:34-59
    assert (
        ds.notes_url(0.0, 0.0, 1.0, 1.0, limit=50, max_days_closed=-1)
        == f"{b}/notes?bbox=0.000000,0.000000,1.000000,1.000000"
        f"&limit=50&closed=-1"
    )
    with pytest.raises(ValueError):
        ds.notes_url(0, 0, 1, 1, limit=0)
    assert ds.user_url(77) == f"{b}/user/77"
    # options.go:17-25 At layout
    assert at_param("2012-06-30 23:59:59") == "at=2012-06-30T23:59:59Z"


def _node_xml(nid, lat, lon, version, changeset, tags=""):
    return (
        f'<node id="{nid}" lat="{lat}" lon="{lon}" version="{version}"'
        f' changeset="{changeset}">{tags}</node>'
    )


def test_fetch_and_parse_with_fake_transport(spark):
    b = BASE_URL
    server = {
        f"{b}/node/5?": _node_xml(5, 1.5, 2.5, 3, 100,
                                  '<tag k="amenity" v="pub"/>'),
        f"{b}/nodes?nodes=5,6": (
            "<osm>"
            + _node_xml(5, 1.5, 2.5, 3, 100)
            + _node_xml(6, -1.25, -2.0, 1, 101)
            + "</osm>"
        ),
        f"{b}/node/5/history": (
            "<osm>"
            + _node_xml(5, 1.0, 2.0, 1, 90)
            + _node_xml(5, 1.5, 2.5, 3, 100)
            + "</osm>"
        ),
        f"{b}/map?bbox=0.000000,0.000000,3.000000,3.000000&": (
            "<osm>" + _node_xml(7, 0.5, 0.5, 2, 104) + "</osm>"
        ),
    }

    def transport(url):
        if url not in server:
            raise NotFoundError(url)
        return server[url].encode()

    ds = OsmApiDatasource(spark, transport)
    r = ds.node(5).collect()[0]
    assert (r.id, r.lat, r.lon, r.version, r.changeset) == (5, 1.5, 2.5, 3, 100)
    assert [(t["_k"], t["_v"]) for t in r.tags] == [("amenity", "pub")]

    rows = {r.id: r for r in ds.nodes([5, 6]).collect()}
    assert rows[6].lat == -1.25 and rows[5].version == 3

    hist = sorted(r.version for r in ds.node_history(5).collect())
    assert hist == [1, 3]

    m = ds.map(0.0, 0.0, 3.0, 3.0).collect()
    assert len(m) == 1 and m[0].id == 7

    # NotFound flows through and is recognizable (datasource.go:119)
    try:
        ds.node(999)
        raised = None
    except NotFoundError as e:
        raised = e
    assert not_found(raised) and "node/999" in str(raised)


def test_status_dispatch():
    raise_for_status(200, "u")
    with pytest.raises(NotFoundError):
        raise_for_status(404, "u")
    with pytest.raises(GoneError):
        raise_for_status(410, "u")
    with pytest.raises(UnexpectedStatusCodeError, match="503"):
        raise_for_status(503, "u")
    assert not not_found(None)


def test_way_relation_fetch_roundtrip(spark):
    """Ways (ordered nd refs) and relations (typed ordered members)
    render through the JVM codec, serve, fetch and re-parse losslessly;
    way_full returns the way AND its nodes from one response."""
    from pyspark.sql import functions as F

    from osm_spark.functions.xml_codec import (
        relation_struct, relation_to_xml, way_struct, way_to_xml,
    )

    b = BASE_URL
    no_tags = F.array().cast("array<struct<k:string,v:string>>")
    wdf = spark.createDataFrame(
        [(9, 2, 70, [3, 1, 2])],
        "id long, version int, changeset long, refs array<long>",
    )
    way_xml = wdf.select(
        way_to_xml(way_struct("id", "version", "changeset", F.col("refs"), no_tags))
        .alias("x")
    ).collect()[0].x
    members = F.array(
        F.struct(F.lit("node").alias("type"), F.lit(3).cast("long").alias("ref"),
                 F.lit("outer").alias("role")),
        F.struct(F.lit("way").alias("type"), F.lit(9).cast("long").alias("ref"),
                 F.lit("").alias("role")),
    )
    rdf = spark.createDataFrame([(4, 1, 71)], "id long, version int, changeset long")
    rel_xml = rdf.select(
        relation_to_xml(
            relation_struct("id", "version", "changeset", members, no_tags)
        ).alias("x")
    ).collect()[0].x

    server = {
        f"{b}/way/9?": way_xml,
        f"{b}/way/9/history": "<osm>" + way_xml + "</osm>",
        f"{b}/way/9/full?": (
            "<osm>" + _node_xml(3, 1.0, 1.5, 1, 60) + way_xml + "</osm>"
        ),
        f"{b}/relation/4?": rel_xml,
    }
    ds = OsmApiDatasource(spark, lambda url: server[url].encode())

    w = ds.way(9).collect()[0]
    assert (w.id, w.version, w.changeset, list(w.refs)) == (9, 2, 70, [3, 1, 2])

    wf, nodes = ds.way_full(9)
    assert wf.collect()[0].refs == [3, 1, 2]
    n = nodes.collect()[0]
    assert (n.id, n.lat) == (3, 1.0)

    r = ds.relation(4).collect()[0]
    assert [(m["type"], m["ref"], m["role"]) for m in r.members] == [
        ("node", 3, "outer"), ("way", 9, ""),
    ]
    assert ds.way_history(9).count() == 1
