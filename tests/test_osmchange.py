"""osmChange codec: wrapper parse/render round-trip, repeated action
blocks accumulate in document order (reference change.go semantics)."""

from pyspark.sql import functions as F

from osm_spark.functions.osmchange import parse_osc, render_osc


_DOC = """<osmChange version="0.6" generator="replication">
<create>
  <node id="1" lat="1.5" lon="2.5" version="1" changeset="10"/>
  <way id="7" version="1" changeset="10"><nd ref="1"/><nd ref="2"/></way>
</create>
<modify>
  <node id="2" lat="-0.5" lon="0.25" version="3" changeset="11">
    <tag k="name" v="x"/></node>
</modify>
<delete>
  <node id="3" lat="0.0" lon="0.0" version="2" changeset="12"/>
</delete>
<modify>
  <node id="4" lat="9.0" lon="-9.0" version="2" changeset="13"/>
</modify>
</osmChange>"""


def test_parse_osc_accumulates_blocks(spark):
    nodes = parse_osc(spark, _DOC, "node").collect()
    acts = {n.id: n.action for n in nodes}
    assert acts == {1: "create", 2: "modify", 3: "delete", 4: "modify"}
    n2 = next(n for n in nodes if n.id == 2)
    assert (n2.lat, n2.version, n2.changeset) == (-0.5, 3, 11)
    assert [(t["_k"], t["_v"]) for t in n2.tags] == [("name", "x")]

    ways = parse_osc(spark, _DOC, "way").collect()
    assert len(ways) == 1
    assert (ways[0].action, ways[0].id, list(ways[0].refs)) == (
        "create", 7, [1, 2],
    )
    assert parse_osc(spark, _DOC, "relation").count() == 0


def test_render_parse_roundtrip(spark):
    from osm_spark.functions.xml_codec import node_struct, node_to_xml

    no_tags = F.array().cast("array<struct<k:string,v:string>>")
    src = spark.createDataFrame(
        [
            (1, 1.5, 2.5, 1, 100, "create", 0),
            (2, -1.0, 0.5, 2, 101, "modify", 0),
            (3, 0.25, 0.125, 3, 102, "delete", 0),
            (4, 8.0, -8.0, 1, 103, "create", 1),
        ],
        "id long, lat double, lon double, version int, changeset long,"
        " action string, order int",
    )
    xml = src.select(
        "action", "order",
        node_to_xml(
            node_struct("id", "lat", "lon", "version", "changeset", no_tags)
        ).alias("xml"),
    )
    doc = render_osc(xml, generator="t")
    assert doc.startswith('<osmChange version="0.6" generator="t"><create>')
    # create block keeps input order (1 then 4)
    assert doc.index('id="1"') < doc.index('id="4"')
    back = parse_osc(spark, doc, "node").collect()
    assert sorted((n.id, n.action, n.lat) for n in back) == [
        (1, "create", 1.5), (2, "modify", -1.0),
        (3, "delete", 0.25), (4, "create", 8.0),
    ]


_DIFF = """<osm>
<action type="create">
  <node id="10" lat="1.0" lon="2.0" version="1" changeset="5"/>
</action>
<action type="modify">
  <old><node id="11" lat="3.0" lon="4.0" version="1" changeset="5"/></old>
  <new><node id="11" lat="3.5" lon="4.5" version="2" changeset="6"/></new>
</action>
<action type="delete">
  <old><way id="12" version="2" changeset="5"><nd ref="1"/></way></old>
  <new><way id="12" version="3" changeset="7"/></new>
</action>
</osm>"""


def test_parse_diff_roles(spark):
    from osm_spark.functions.osmchange import parse_diff

    nodes = parse_diff(spark, _DIFF, "node").collect()
    got = sorted((n.action, n.role, n.id, n.version, n.lat) for n in nodes)
    assert got == [
        ("create", "new", 10, 1, 1.0),
        ("modify", "new", 11, 2, 3.5),
        ("modify", "old", 11, 1, 3.0),
    ]
    ways = parse_diff(spark, _DIFF, "way").collect()
    w = sorted((x.action, x.role, x.id, x.version, list(x.refs or [])) for x in ways)
    assert w == [
        ("delete", "new", 12, 3, []),
        ("delete", "old", 12, 2, [1]),
    ]


def test_render_parse_diff_roundtrip(spark):
    from osm_spark.functions.osmchange import parse_diff, render_diff
    from osm_spark.functions.xml_codec import node_struct, node_to_xml

    no_tags = F.array().cast("array<struct<k:string,v:string>>")
    src = spark.createDataFrame(
        [
            ("create", 0, 20, 1.0, 1, None),
            ("modify", 1, 21, 2.0, 2, 1),
            ("delete", 2, 22, 3.0, 4, 3),
        ],
        "type string, order int, id long, lat double,"
        " new_version int, old_version int",
    )
    mk = lambda ver, latshift: node_to_xml(
        node_struct(
            "id", F.col("lat") + latshift, F.lit(0.0), ver, F.lit(9), no_tags
        )
    )
    xml = src.select(
        "type", "order",
        mk(F.col("new_version"), 0.0).alias("new_xml"),
        F.when(
            F.col("old_version").isNotNull(), mk(F.col("old_version"), -0.5)
        ).alias("old_xml"),
    )
    doc = render_diff(xml)
    back = parse_diff(spark, doc, "node").collect()
    got = sorted((n.action, n.role, n.id, n.version, n.lat) for n in back)
    assert got == [
        ("create", "new", 20, 1, 1.0),
        ("delete", "new", 22, 4, 3.0),
        ("delete", "old", 22, 3, 2.5),
        ("modify", "new", 21, 2, 2.0),
        ("modify", "old", 21, 1, 1.5),
    ]
