"""Relation annotation golden tests — reference annotate/testdata
relation_{2714790,4017808} fixtures, mirroring annotate/relation_test.go:
annotate all way histories first, then annotate the relations and
compare every member slot and update row-for-row."""

import xml.etree.ElementTree as ET
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

from tests.test_annotate_golden import NODE_SCHEMA, WAY_SCHEMA, _ts

import os

FIXDIR = "/root/reference/annotate/testdata"

pytestmark = __import__("pytest").mark.skipif(
    not os.path.isdir(FIXDIR),
    reason="reference golden fixtures not present in this environment",
)

REL_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("version", IntegerType()),
    StructField("visible", BooleanType()),
    StructField("changeset", LongType()),
    StructField("ts", TimestampType()),
    StructField("committed", TimestampType()),
    StructField("members", ArrayType(StructType([
        StructField("type", StringType()),
        StructField("ref", LongType()),
        StructField("role", StringType()),
    ]))),
])


def parse_all(path):
    root = ET.parse(path).getroot()
    nodes, ways, rels = [], [], []
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
    for r in root.findall("relation"):
        members = [
            (m.get("type"), int(m.get("ref")), m.get("role", ""))
            for m in r.findall("member")
        ]
        rels.append((
            int(r.get("id")), int(r.get("version")),
            r.get("visible", "true") == "true",
            int(r.get("changeset", "0")), _ts(r.get("timestamp")),
            _ts(r.get("committed")), members,
        ))
    return nodes, ways, rels


def parse_expected_relations(path, rel_id):
    root = ET.parse(path).getroot()
    exp = {}
    for r in root.findall("relation"):
        key = (int(r.get("id")), int(r.get("version")))
        members = [
            (
                m.get("type"),
                int(m.get("ref")),
                m.get("role", ""),
                int(m.get("version", "0")),
                int(m.get("changeset", "0")),
                float(m.get("lat", "0")),
                float(m.get("lon", "0")),
                int(m.get("orientation", "0")),
            )
            for m in r.findall("member")
        ]
        upds = [
            (
                int(u.get("index")),
                int(u.get("version")),
                pd.Timestamp(u.get("timestamp").replace("Z", "")),
                int(u.get("changeset", "0")),
                float(u.get("lat", "0")),
                float(u.get("lon", "0")),
                u.get("reverse", "false") == "true",
            )
            for u in r.findall("update")
        ]
        exp[key] = (members, upds)
    return exp


@pytest.mark.parametrize("rel_id", [2714790, 4017808])
def test_relation_annotation_golden(spark, rel_id):
    from osm_spark.temporal.annotate import annotate_ways
    from osm_spark.temporal.relations import annotate_relations

    nodes, ways, rels = parse_all(f"{FIXDIR}/relation_{rel_id}.osm")
    exp = parse_expected_relations(
        f"{FIXDIR}/relation_{rel_id}_expected.osm", rel_id
    )

    ndf = spark.createDataFrame(nodes, NODE_SCHEMA)
    wdf = spark.createDataFrame(ways, WAY_SCHEMA)
    rdf = spark.createDataFrame(rels, REL_SCHEMA)

    w_ann = annotate_ways(wdf, ndf)
    # the fixture relation under test is rel_id; its history is the
    # relations in the file with that id (others are nested children)
    target = rdf.filter(F.col("id") == rel_id)
    out = annotate_relations(
        target, ndf, w_ann.drop("tags", "user", "uid"),
        relation_histories=rdf, ignore_inconsistency=False,
    ).collect()

    exp_target = {k: v for k, v in exp.items() if k[0] == rel_id}
    assert len(out) == len(exp_target)
    for row in out:
        key = (row.id, row.version)
        mem_exp, upd_exp = exp_target[key]
        mem_got = [
            (m.type, m.ref, m.role, m.version, m.changeset, m.lat, m.lon,
             m.orientation)
            for m in (row.members or [])
        ]
        assert mem_got == mem_exp, (
            f"relation {key}: members differ\nfirst diff: "
            + str(next(((g, e) for g, e in zip(mem_got, mem_exp) if g != e), None))
        )
        upd_got = [
            (u.idx, u.version, pd.Timestamp(u.ts), u.changeset, u.lat, u.lon,
             bool(u.reverse))
            for u in (row.updates or [])
        ]
        assert upd_got == upd_exp, (
            f"relation {key}: updates differ\ngot {upd_got[:4]}\nexp {upd_exp[:4]}"
        )
