"""Way.Polygon() heuristic + tag predicates — cases ported from
reference polygon_test.go and tag_test.go."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_spark.functions import polygon, tags as T


CASES = [
    # (tags, expected) — polygon_test.go:30-93
    ({"area": "no", "building": "yes"}, False),
    ({"area": "maybe", "building": "no"}, True),
    ({"building": "no", "boundary": "yes"}, True),
    ({"railway": "station"}, True),
    ({"railway": "line"}, False),
    ({"man_made": "cutline"}, False),
    ({"man_made": "thing"}, True),
    ({"indoor": "anything"}, True),
    ({}, False),
    ({"building": "yes"}, True),
]


def test_polygon_condition_table(spark):
    rows = [Row(i=i, tags=t) for i, (t, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, tags map<string,string>")
    closed = [(1,), (2,), (3,), (1,)]
    df = df.withColumn("nodes", F.lit(None)).select(
        "i",
        "tags",
        F.expr("array(struct(1L as ref),struct(2L as ref),struct(3L as ref),struct(1L as ref))").alias("nodes"),
    )
    got = df.select("i", polygon.way_is_polygon("nodes", "tags").alias("p")).collect()
    for r in got:
        assert r.p == CASES[r.i][1], (r.i, CASES[r.i])


def test_polygon_shape_requirements(spark):
    """polygon_test.go:9-23: >3 nodes and closed."""
    df = spark.createDataFrame(
        [
            Row(i=0, refs=[1, 2, 3]),        # too short
            Row(i=1, refs=[1, 2, 3, 10]),    # not closed
            Row(i=2, refs=[1, 2, 3, 1]),     # ok
        ]
    ).select(
        "i",
        F.transform("refs", lambda r: F.struct(r.cast("long").alias("ref"))).alias("nodes"),
        F.create_map(F.lit("building"), F.lit("yes")).alias("tags"),
    )
    got = {r.i: r.p for r in df.select("i", polygon.way_is_polygon("nodes", "tags").alias("p")).collect()}
    assert got == {0: False, 1: False, 2: True}


def test_tags_predicates(spark):
    df = spark.createDataFrame(
        [
            Row(i=0, tags={"source": "x", "created_by": "y"}),
            Row(i=1, tags={"source": "x", "highway": "road"}),
            Row(i=2, tags={}),
        ],
        "i int, tags map<string,string>",
    )
    got = {
        r.i: (r.f, r.h, r.ai)
        for r in df.select(
            "i",
            T.find("tags", "highway").alias("f"),
            T.has_tag("tags", "source").alias("h"),
            T.any_interesting("tags").alias("ai"),
        ).collect()
    }
    assert got[0] == ("", True, False)
    assert got[1] == ("road", True, True)
    assert got[2] == ("", False, False)


def test_has_interesting_tags_ignore_map(spark):
    """convert.go:389-403: value-sensitive ignore map."""
    df = spark.createDataFrame(
        [
            Row(i=0, tags={"landuse": "forest"}),
            Row(i=1, tags={"landuse": "other"}),
            Row(i=2, tags={"natural": "x"}),
        ],
        "i int, tags map<string,string>",
    )
    got = {
        r.i: r.v
        for r in df.select(
            "i",
            T.has_interesting_tags("tags", {"landuse": "forest", "natural": "true"}).alias("v"),
        ).collect()
    }
    assert got == {0: False, 1: True, 2: False}
