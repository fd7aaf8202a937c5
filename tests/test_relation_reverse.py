"""TestRelation_reverse port (annotate/relation_test.go:52-140): way
minor-version updates carry a Reverse flag; closed rings whose (0,0)
sentinel nodes drop out of the LineString are NOT reverses."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

from tests.test_annotate_golden import NODE_SCHEMA
from tests.test_annotate_relations_golden import REL_SCHEMA

ANN_WAY_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("visible", BooleanType()),
    StructField("changeset", LongType()),
    StructField("ts", TimestampType()),
    StructField("committed", TimestampType()),
    StructField("nodes", ArrayType(StructType([
        StructField("ref", LongType()),
        StructField("version", IntegerType()),
        StructField("changeset", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
    ]))),
])

OLD = datetime(1970, 1, 1)   # stands in for Go's zero time (pre-CIS)
NEW = datetime(2024, 1, 1)


def nd(ref, lon, lat):
    return (ref, 0, 0, float(lat), float(lon))


def _ways(spark):
    rows = [
        # way 1: open line reversed between versions
        (1, 1, True, 0, OLD, None, [nd(3, 3, 3), nd(2, 0, 3), nd(1, 0, 0)]),
        (1, 2, True, 0, NEW, None, [nd(1, 0, 0), nd(2, 0, 3), nd(3, 3, 3)]),
        # way 2: closed ring; the (0,0) node drops from the LineString so
        # both versions have zero area -> NOT a reverse
        (2, 1, True, 0, OLD, None,
         [nd(3, 3, 3), nd(2, 0, 3), nd(1, 0, 0), nd(3, 3, 3)]),
        (2, 2, True, 0, NEW, None,
         [nd(3, 3, 3), nd(1, 0, 0), nd(2, 0, 3), nd(3, 3, 3)]),
    ]
    return spark.createDataFrame(rows, ANN_WAY_SCHEMA)


def _run(spark, way_ref):
    from osm_spark.temporal.relations import annotate_relations

    rels = spark.createDataFrame(
        [(1, 1, True, 0, OLD, None, [("way", way_ref, "outer")])], REL_SCHEMA
    )
    nodes = spark.createDataFrame([], NODE_SCHEMA)
    out = annotate_relations(
        rels, nodes, _ways(spark), threshold_sec=3600,
        ignore_inconsistency=True,
    ).collect()
    return out[0]


def test_segment_reverse(spark):
    r = _run(spark, 1)
    assert len(r.updates) == 1
    assert r.updates[0].version == 2
    assert bool(r.updates[0].reverse) is True


def test_closed_ring_not_reverse(spark):
    r = _run(spark, 2)
    assert len(r.updates) == 1
    assert bool(r.updates[0].reverse) is False
