"""PBF wire format: protobuf varint/zigzag/packed layer, DenseNodes
delta columns + DenseInfo, way/relation groups, string table, zlib
blobs, BigEndian framing, and the block-parallel Spark scan."""

from osm_spark.sources import pbf as P

NODES = [
    {"id": 100, "lat": 51.5074, "lon": -0.1278,
     "tags": {"amenity": "pub", "name": "A"},
     "version": 2, "timestamp": 1700000000, "changeset": 55, "uid": 7,
     "user": "alice", "visible": True},
    {"id": 205, "lat": -33.8688, "lon": 151.2093, "tags": {},
     "version": 1, "timestamp": 1700000100, "changeset": 56, "uid": 8,
     "user": "bob", "visible": True},
    {"id": 50, "lat": 0.0000001, "lon": -0.0000001, "tags": {"x": "y"},
     "version": 3, "timestamp": 1699999000, "changeset": 54, "uid": 7,
     "user": "alice", "visible": False},
]
WAYS = [
    {"id": 9, "refs": [100, 205, 50], "tags": {"highway": "primary"}},
    {"id": 10, "refs": [50, 100]},
]
RELS = [
    {"id": 4, "members": [("node", 100, "outer"), ("way", 9, "")],
     "tags": {"type": "multipolygon"}},
]


def test_pbf_full_roundtrip():
    blk = P.encode_primitive_block(NODES, WAYS, RELS)
    buf = P.encode_pbf([blk], with_history=True)
    blobs = P.split_blobs(buf)
    assert [t for t, _ in blobs] == ["OSMHeader", "OSMData"]
    hdr = P.decode_header(P.decompress_blob(blobs[0][1]))
    assert hdr["required_features"] == [
        "OsmSchema-V0.6", "DenseNodes", "HistoricalInformation",
    ]
    out = P.decode_primitive_block(P.decompress_blob(blobs[1][1]))
    n = out["nodes"]
    assert list(n["id"]) == [100, 205, 50]
    for i, src in enumerate(NODES):
        assert abs(n["lat"][i] - src["lat"]) < 5e-8
        assert abs(n["lon"][i] - src["lon"]) < 5e-8
        assert n["tags"][i] == src["tags"]
        assert n["version"][i] == src["version"]
        assert n["timestamp"][i] == src["timestamp"]
        assert n["user"][i] == src["user"]
        assert bool(n["visible"][i]) == src["visible"]
    assert out["ways"][0]["refs"] == [100, 205, 50]
    assert out["ways"][0]["tags"] == {"highway": "primary"}
    assert out["relations"][0]["members"] == [
        ("node", 100, "outer"), ("way", 9, ""),
    ]


def test_pbf_zigzag_and_delta_edges():
    """Negative ids/coords, non-monotone deltas, tagless block."""
    nodes = [
        {"id": 5, "lat": -89.999, "lon": 179.999},
        {"id": -3, "lat": 89.999, "lon": -179.999},
        {"id": 1000000007, "lat": 0.0, "lon": 0.0},
    ]
    blk = P.encode_primitive_block(nodes)
    out = P.decode_primitive_block(
        P.decompress_blob(P.split_blobs(P.encode_pbf([blk]))[1][1])
    )
    n = out["nodes"]
    assert list(n["id"]) == [5, -3, 1000000007]
    assert abs(n["lat"][1] - 89.999) < 5e-8
    assert abs(n["lon"][1] - (-179.999)) < 5e-8
    assert n["tags"] == [{}, {}, {}]


def test_pbf_spark_scan(spark):
    """Block-parallel mapInPandas scan over multiple OSMData blobs."""
    blocks = [
        P.encode_primitive_block(
            nodes=[
                {"id": b * 100 + i, "lat": b + i * 0.001, "lon": -b - i * 0.002}
                for i in range(10)
            ]
        )
        for b in range(4)
    ]
    df = P.read_pbf_nodes(spark, P.encode_pbf(blocks))
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 40
    assert abs(rows[205].lat - (2 + 5 * 0.001)) < 5e-8


def test_pbf_spark_way_relation_scan(spark):
    blk = P.encode_primitive_block(NODES, WAYS, RELS)
    buf = P.encode_pbf([blk])
    ways = {r.id: r for r in P.read_pbf_ways(spark, buf).collect()}
    assert list(ways[9].refs) == [100, 205, 50]
    assert ways[9].tags == {"highway": "primary"}
    assert list(ways[10].refs) == [50, 100]
    rels = P.read_pbf_relations(spark, buf).collect()
    assert len(rels) == 1
    assert [(m["type"], m["ref"], m["role"]) for m in rels[0].members] == [
        ("node", 100, "outer"), ("way", 9, ""),
    ]
    assert rels[0].tags == {"type": "multipolygon"}
