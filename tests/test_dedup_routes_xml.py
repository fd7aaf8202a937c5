"""Unit tests: char-n-gram jaccard, route assembly wrapper, XML codec."""

from __future__ import annotations

import pyspark.sql.functions as F

from osm_spark.text import dedup


def test_char_shingles(spark):
    df = spark.createDataFrame(
        [(1, "abcde"), (2, "abc"), (3, "ab"), (4, "aaaa")],
        "id long, text string",
    )
    got = {r.id: sorted(r.sh) for r in df.select(
        "id", dedup.char_shingles("text", 4).alias("sh")).collect()}
    assert got[1] == ["abcd", "bcde"]
    assert got[2] == []  # shorter than n
    assert got[3] == []
    assert got[4] == ["aaaa"]  # distinct


def test_ngram_jaccard_pairs(spark):
    # same length bucket; texts share half their grams
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdwxyz"), (3, "q" * 200)],
        "doc_id long, text string",
    )
    rows = {(r.a, r.b): (r.inter, r.uni) for r in dedup.ngram_jaccard_pairs(
        df, n=4, block_len=32).collect()}
    # doc 3 is in a different length bucket -> only pair (1,2)
    assert set(rows) == {(1, 2)}
    # grams(1): abcd bcde cdef defg efgh ; grams(2): abcd bcdw cdwx dwxy wxyz
    assert rows[(1, 2)] == (1, 9)


def test_route_assembly_reversed_member(spark):
    """3-way chain, middle way reversed: joined into one linestring with
    shared endpoints deduped (convert.go:233-301 semantics)."""
    from osm_spark.geom.assembly import assemble_routes_df

    members = [("way", 10), ("way", 11), ("way", 12)]
    relations = spark.createDataFrame(
        [(1, [(t, r, "", 0) for t, r in members])],
        "rel_id long, members array<struct<type:string,ref:long,role:string,orientation:int>>",
    )
    P = [(0.0, 0.0), (1.0, 0.5), (2.0, 1.0), (3.0, 1.5)]
    ways = spark.createDataFrame(
        [
            (10, [P[0], P[1]]),
            (11, [P[2], P[1]]),  # reversed
            (12, [P[2], P[3]]),
        ],
        "ref long, line array<struct<lon:double,lat:double>>",
    )
    out = assemble_routes_df(relations, ways).collect()
    assert len(out) == 1 and out[0].line_idx == 0 and not out[0].tainted
    pts = [(p.lon, p.lat) for p in out[0].line]
    assert pts == P or pts == P[::-1]


def test_route_missing_member_tainted(spark):
    from osm_spark.geom.assembly import assemble_routes_df

    relations = spark.createDataFrame(
        [(1, [("way", 10, "", 0), ("way", 99, "", 0)])],
        "rel_id long, members array<struct<type:string,ref:long,role:string,orientation:int>>",
    )
    ways = spark.createDataFrame(
        [(10, [(0.0, 0.0), (1.0, 1.0)])],
        "ref long, line array<struct<lon:double,lat:double>>",
    )
    out = assemble_routes_df(relations, ways).collect()
    assert len(out) == 1 and out[0].tainted


def test_xml_codec_roundtrip(spark):
    from osm_spark.functions import xml_codec as X

    df = spark.createDataFrame(
        [(7, 1.5, -2.5, 3, 42, [("highway", "primary"), ("name", "x y")])],
        "id long, lat double, lon double, version int, changeset long,"
        " tags array<struct<k:string,v:string>>",
    )
    node = X.node_struct(
        "id", "lat", "lon", "version", "changeset", F.col("tags")
    )
    xml = df.select(X.node_to_xml(node).alias("x"))
    s = xml.first().x
    assert s.startswith('<node id="7" lat="1.5" lon="-2.5"')
    assert '<tag k="highway" v="primary"/>' in s
    back = xml.select(X.xml_to_node(F.col("x")).alias("p")).select("p.*").first()
    assert back._id == 7 and back._lat == 1.5 and back._changeset == 42
    assert [(t._k, t._v) for t in back.tag] == [
        ("highway", "primary"), ("name", "x y")
    ]
