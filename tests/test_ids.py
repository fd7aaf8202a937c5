"""Packed-id bit math parity (reference element_test.go / feature_test.go)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_spark.core import ids


def test_pack_unpack_roundtrip(spark):
    rows = [
        Row(typ="node", ref=1, version=1),
        Row(typ="node", ref=1, version=0),
        Row(typ="way", ref=115, version=12),
        Row(typ="relation", ref=20, version=3),
        # max 40-bit ref with max version (int64 sign bit stays clear)
        Row(typ="node", ref=(1 << 40) - 1, version=(1 << 16) - 1),
    ]
    df = spark.createDataFrame(rows)
    packed = ids.eid(F.col("typ"), "ref", "version")
    got = df.select(
        "typ",
        "ref",
        "version",
        packed.alias("eid"),
        ids.type_of(packed).alias("t2"),
        ids.ref_of(packed).alias("r2"),
        ids.version_of(packed).alias("v2"),
    ).collect()
    for r in got:
        assert r.t2 == r.typ and r.r2 == r.ref and r.v2 == r.version
        assert r.eid > 0  # sign bit must stay clear (feature.go masks)


def test_known_go_values(spark):
    """element.go: NodeID(1).ElementID(1) == nodeMask | 1<<16 | 1."""
    df = spark.createDataFrame([Row(ref=1)])
    v = df.select(ids.eid("node", "ref", F.lit(1)).alias("e")).first().e
    assert v == 0x1000000000000000 | (1 << 16) | 1
    w = df.select(ids.feature_id("way", "ref").alias("f")).first().f
    assert w == 0x2000000000000000 | (1 << 16)


def test_sort_order_is_type_ref_version(spark):
    rows = [
        ("relation", 1, 1),
        ("node", 2, 1),
        ("node", 1, 2),
        ("node", 1, 1),
        ("way", 1, 1),
    ]
    df = spark.createDataFrame([Row(typ=t, ref=r, version=v) for t, r, v in rows])
    got = (
        df.select("typ", "ref", "version", ids.eid(F.col("typ"), "ref", "version").alias("e"))
        .orderBy("e")
        .collect()
    )
    assert [(r.typ, r.ref, r.version) for r in got] == [
        ("node", 1, 1),
        ("node", 1, 2),
        ("node", 2, 1),
        ("way", 1, 1),
        ("relation", 1, 1),
    ]


def test_id_string_format_and_parse(spark):
    df = spark.createDataFrame([Row(ref=115, version=12)])
    packed = ids.eid("way", "ref", "version")
    r = df.select(
        ids.id_string(packed).alias("s"),
        ids.parse_id_string(F.lit("way/115:12")).alias("back"),
        ids.id_string(ids.feature_of(packed)).alias("fs"),
        packed.alias("e"),
    ).first()
    assert r.s == "way/115:12"
    assert r.back == r.e
    assert r.fs == "way/115"
