"""TestRelation_polygon port (annotate/relation_test.go:142-247):
member orientation annotation for multipolygon relations, including a
reversed-on-update outer way and open inner segments."""

from datetime import datetime

from pyspark.sql import functions as F

from tests.test_annotate_golden import NODE_SCHEMA
from tests.test_relation_reverse import ANN_WAY_SCHEMA, NEW, OLD, nd
from tests.test_annotate_relations_golden import REL_SCHEMA


def test_polygon_member_orientation(spark):
    from osm_spark.temporal.annotate import annotate_ways  # noqa: F401
    from osm_spark.temporal.relations import (
        annotate_orientation, annotate_relations,
    )

    near = datetime(2024, 6, 1)
    ways = spark.createDataFrame(
        [
            (1, 1, True, 0, OLD, None, [nd(3, 3, 3), nd(2, 0, 3), nd(1, 0, 0)]),
            (1, 2, True, 0, NEW, None, [nd(1, 0, 0), nd(2, 0, 3), nd(3, 3, 3)]),
            (2, 1, True, 0, OLD, None, [nd(3, 3, 3), nd(4, 3, 0), nd(1, 0, 0)]),
            (2, 2, True, 0, near, None, [nd(3, 3, 3), nd(4, 3, 0.1), nd(1, 0, 0)]),
            (3, 0, True, 0, OLD, None, [nd(5, 1, 1), nd(6, 2, 1), nd(7, 2, 2)]),
            (4, 0, True, 0, OLD, None, [nd(5, 1, 1), nd(8, 1, 2), nd(7, 2, 2)]),
        ],
        ANN_WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [
            (
                1, 1, True, 0, OLD, None,
                [
                    ("way", 1, "outer"),
                    ("way", 2, "outer"),
                    ("way", 3, "inner"),
                    ("way", 4, "inner"),
                ],
            )
        ],
        REL_SCHEMA,
    )
    nodes = spark.createDataFrame([], NODE_SCHEMA)
    ann = annotate_relations(
        rels, nodes, ways, threshold_sec=3600, ignore_inconsistency=True
    ).withColumn(
        "tags", F.create_map(F.lit("type"), F.lit("multipolygon"))
    )
    out = annotate_orientation(ann, ways).collect()
    r = out[0]
    got = [m.orientation for m in r.members]
    assert got == [1, -1, 1, -1], got  # CCW, CW, CCW, CW
    assert bool(r.updates[0].reverse) is True
    assert bool(r.updates[1].reverse) is False
