"""Golden annotation tests — reference annotate/testdata fixtures.

Mirrors annotate/way_test.go:14-45: load way_{6394949,230391153}.osm
(full node histories + way versions), run the engine's annotate_ways,
compare every node slot and every update row-for-row against
way_*_expected.osm. Coordinates are copied (not computed) so comparison
is exact.
"""

import xml.etree.ElementTree as ET

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

import os

FIXDIR = "/root/reference/annotate/testdata"

pytestmark = __import__("pytest").mark.skipif(
    not os.path.isdir(FIXDIR),
    reason="reference golden fixtures not present in this environment",
)

NODE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("visible", BooleanType()),
    StructField("changeset", LongType()),
    StructField("ts", TimestampType()),
    StructField("committed", TimestampType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
])

WAY_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("visible", BooleanType()),
    StructField("changeset", LongType()),
    StructField("ts", TimestampType()),
    StructField("committed", TimestampType()),
    StructField("nodes", ArrayType(StructType([StructField("ref", LongType())]))),
])


def _ts(s):
    return pd.Timestamp(s.replace("Z", "")).to_pydatetime() if s else None


def parse_osm(path):
    root = ET.parse(path).getroot()
    nodes, ways = [], []
    for n in root.findall("node"):
        nodes.append((
            int(n.get("id")), int(n.get("version")),
            n.get("visible", "true") == "true",
            int(n.get("changeset", "0")), _ts(n.get("timestamp")),
            _ts(n.get("committed")),
            float(n.get("lat", "0")), float(n.get("lon", "0")),
        ))
    for w in root.findall("way"):
        refs = [(int(nd.get("ref")),) for nd in w.findall("nd")]
        ways.append((
            int(w.get("id")), int(w.get("version")),
            w.get("visible", "true") == "true",
            int(w.get("changeset", "0")), _ts(w.get("timestamp")),
            _ts(w.get("committed")), refs,
        ))
    return nodes, ways


def parse_expected(path):
    root = ET.parse(path).getroot()
    exp = {}
    for w in root.findall("way"):
        key = (int(w.get("id")), int(w.get("version")))
        nds = [
            (
                int(nd.get("ref")),
                int(nd.get("version", "0")),
                int(nd.get("changeset", "0")),
                float(nd.get("lat", "0")),
                float(nd.get("lon", "0")),
            )
            for nd in w.findall("nd")
        ]
        upds = [
            (
                int(u.get("index")),
                int(u.get("version")),
                _ts(u.get("timestamp")),
                int(u.get("changeset", "0")),
                float(u.get("lat", "0")),
                float(u.get("lon", "0")),
            )
            for u in w.findall("update")
        ]
        exp[key] = (nds, upds)
    return exp


@pytest.mark.parametrize("way_id", [6394949, 230391153])
def test_way_annotation_golden(spark, way_id):
    from osm_spark.temporal.annotate import annotate_ways

    nodes, ways = parse_osm(f"{FIXDIR}/way_{way_id}.osm")
    exp = parse_expected(f"{FIXDIR}/way_{way_id}_expected.osm")

    ndf = spark.createDataFrame(nodes, NODE_SCHEMA)
    wdf = spark.createDataFrame(ways, WAY_SCHEMA)
    out = annotate_ways(wdf, ndf).collect()

    assert len(out) == len(exp)
    for row in out:
        key = (row.id, row.version)
        nds_exp, upds_exp = exp[key]
        nds_got = [
            (n.ref, n.version, n.changeset, n.lat, n.lon) for n in (row.nodes or [])
        ]
        assert nds_got == nds_exp, f"way {key} node slots differ:\n{nds_got}\nvs\n{nds_exp}"
        upds_got = [
            (u.idx, u.version, pd.Timestamp(u.ts), u.changeset, u.lat, u.lon)
            for u in (row.updates or [])
        ]
        assert upds_got == upds_exp, (
            f"way {key} updates differ:\ngot {upds_got}\nexp {upds_exp}"
        )
