"""osmChange (.osc) document codec — the reference's Change wrappers
(change.go:10-22 struct, MarshalXML wrapper casing change.go:65-124)
and the payload format of replication diffs (replication/interval.go
fetches `.osc.gz` and decodes exactly this shape).

    <osmChange version="0.6" generator="...">
      <create><node .../>...</create>
      <modify><way .../>...</modify>
      <delete><node .../>...</delete>
    </osmChange>

A document may carry REPEATED action blocks (real minutely diffs do);
like the reference's decoder they accumulate in document order. All
parsing is JVM-side: action blocks and element snippets lift out with
``regexp_extract_all``, elements parse with ``from_xml`` through the
same schemas as the element codec (functions/xml_codec.py). Rendering
uses ``to_xml`` per element + one ordered aggregation.

Scale note: ONE .osc document is one replication batch (minutes of
edits, MBs) — document-sized work, exactly like the reference. Bulk
history flows through parquet/PBF; a directory of .osc files
parallelizes by mapping this codec over a file DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ACTIONS = ("create", "modify", "delete")

_BLOCK_PAT = r"(<(?:create|modify|delete)>[\s\S]*?</(?:create|modify|delete)>)"


def _blocks(spark: SparkSession, body: str) -> DataFrame:
    """-> (block_idx, action, block) one row per action block, document
    order preserved (the reference accumulates repeated blocks the
    same way)."""
    df = spark.createDataFrame([(body,)], "body string")
    return (
        df.select(
            F.posexplode(
                F.regexp_extract_all("body", F.lit(_BLOCK_PAT), 1)
            ).alias("block_idx", "block")
        )
        .select(
            "block_idx",
            F.regexp_extract("block", r"^<(create|modify|delete)>", 1).alias(
                "action"
            ),
            "block",
        )
    )


def parse_osc(spark: SparkSession, body: str, etype: str) -> DataFrame:
    """Parse one osmChange document -> typed rows of ``etype`` with
    their action. Columns mirror the element codec plus ``action``."""
    from osm_spark.functions.xml_codec import (
        _NODE_SCHEMA, _REL_SCHEMA, _WAY_SCHEMA,
    )

    pat = rf"(<{etype}\b[^>]*/>|<{etype}\b[\s\S]*?</{etype}>)"
    snippets = _blocks(spark, body).select(
        "block_idx",
        "action",
        F.posexplode(
            F.regexp_extract_all("block", F.lit(pat), 1)
        ).alias("elem_idx", "xml"),
    )
    if etype == "node":
        e = snippets.withColumn(
            "e", F.from_xml("xml", _NODE_SCHEMA, {"rowTag": "node"})
        )
        return e.select(
            "action",
            F.col("e._id").alias("id"),
            F.col("e._lat").alias("lat"),
            F.col("e._lon").alias("lon"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.col("e.tag").alias("tags"),
        )
    if etype == "way":
        e = snippets.withColumn(
            "e", F.from_xml("xml", _WAY_SCHEMA, {"rowTag": "way"})
        )
        return e.select(
            "action",
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform("e.nd", lambda n: n["_ref"]).alias("refs"),
            F.col("e.tag").alias("tags"),
        )
    if etype == "relation":
        e = snippets.withColumn(
            "e", F.from_xml("xml", _REL_SCHEMA, {"rowTag": "relation"})
        )
        return e.select(
            "action",
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform(
                "e.member",
                lambda m: F.struct(
                    m["_type"].alias("type"),
                    m["_ref"].alias("ref"),
                    m["_role"].alias("role"),
                ),
            ).alias("members"),
            F.col("e.tag").alias("tags"),
        )
    raise ValueError(f"parse_osc: unsupported element type {etype!r}")


def parse_diff(spark: SparkSession, body: str, etype: str) -> DataFrame:
    """Parse an augmented diff `<osm><action type=..>` document
    (diff.go:21-80: create actions carry the bare new element,
    modify/delete carry <old>/<new> wrappers) -> typed rows with
    ``action`` and ``role`` ('old'/'new'; a create's element is its
    new state, diff.go:19-20)."""
    from osm_spark.functions.xml_codec import _NODE_SCHEMA, _WAY_SCHEMA

    schema = {"node": _NODE_SCHEMA, "way": _WAY_SCHEMA}.get(etype)
    if schema is None:
        raise ValueError(f"parse_diff: unsupported element type {etype!r}")
    elem_pat = rf"(<{etype}\b[^>]*/>|<{etype}\b[\s\S]*?</{etype}>)"

    df = spark.createDataFrame([(body,)], "body string")
    acts = df.select(
        F.posexplode(
            F.regexp_extract_all(
                "body", F.lit(r"(<action\b[\s\S]*?</action>)"), 1
            )
        ).alias("action_idx", "block")
    ).select(
        "action_idx",
        F.regexp_extract("block", r'type="(create|modify|delete)"', 1).alias(
            "action"
        ),
        F.regexp_extract("block", r"<old>([\s\S]*?)</old>", 1).alias("old_s"),
        F.regexp_extract("block", r"<new>([\s\S]*?)</new>", 1).alias("new_s"),
        # create: the bare element body (strip any old/new wrappers)
        F.regexp_replace(
            "block", r"<old>[\s\S]*?</old>|<new>[\s\S]*?</new>", ""
        ).alias("bare_s"),
    )

    def section(src_col: str, role: str, only_create: bool) -> DataFrame:
        d = acts
        if only_create:
            d = d.where(F.col("action") == "create")
        return d.select(
            "action_idx",
            "action",
            F.lit(role).alias("role"),
            F.explode(
                F.regexp_extract_all(src_col, F.lit(elem_pat), 1)
            ).alias("xml"),
        )

    rows = (
        section("old_s", "old", False)
        .unionByName(section("new_s", "new", False))
        .unionByName(section("bare_s", "new", True))
    )
    e = rows.withColumn("e", F.from_xml("xml", schema, {"rowTag": etype}))
    common = [
        "action", "role",
        F.col("e._id").alias("id"),
        F.col("e._version").alias("version"),
        F.col("e._changeset").alias("changeset"),
    ]
    if etype == "node":
        return e.select(
            *common,
            F.col("e._lat").alias("lat"),
            F.col("e._lon").alias("lon"),
            F.col("e.tag").alias("tags"),
        )
    return e.select(
        *common,
        F.transform("e.nd", lambda n: n["_ref"]).alias("refs"),
        F.col("e.tag").alias("tags"),
    )


def render_diff(actions: DataFrame) -> str:
    """Render (type, order, new_xml, old_xml) rows into ONE augmented
    diff document (diff.go:83-109 writer: create emits the bare
    element, modify/delete emit <old><new> wrappers; one <action> per
    row, document order by ``order``)."""
    rows = (
        actions.select(
            F.array_sort(
                F.collect_list(
                    F.struct("order", "type", "new_xml", "old_xml")
                )
            ).alias("a")
        )
        .collect()[0]["a"]
    )
    parts = ["<osm>"]
    for r in rows:
        t = r["type"]
        if t == "create":
            parts.append(f'<action type="create">{r["new_xml"]}</action>')
        elif t in ("modify", "delete"):
            parts.append(
                f'<action type="{t}"><old>{r["old_xml"]}</old>'
                f'<new>{r["new_xml"]}</new></action>'
            )
        else:
            raise ValueError(f"render_diff: unknown action type {t!r}")
    parts.append("</osm>")
    return "".join(parts)


def render_osc(
    nodes_xml: DataFrame,
    version: str = "0.6",
    generator: str = "osm_spark",
) -> str:
    """Render (action, order, xml) rows into ONE osmChange document.

    Wrapper casing and attribute order follow the reference writer
    (change.go:65-124: osmChange + version + generator attrs); blocks
    emit in create/modify/delete order (the wiki/document convention),
    elements within a block in ``order``. Input xml comes from the
    element codec's to_xml, so the document round-trips through
    parse_osc exactly. Driver-side string assembly — an .osc document
    is batch-sized by construction."""
    rows = (
        nodes_xml.groupBy("action")
        .agg(
            F.concat_ws(
                "", F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("order", "xml"))
                    ),
                    lambda s: s["xml"],
                )
            ).alias("body")
        )
        .collect()
    )
    by_action = {r["action"]: r["body"] for r in rows}
    unknown = set(by_action) - set(ACTIONS)
    if unknown:
        raise ValueError(f"render_osc: unknown actions {sorted(unknown)}")
    parts = [f'<osmChange version="{version}" generator="{generator}">']
    for a in ACTIONS:
        if a in by_action:
            parts.append(f"<{a}>{by_action[a]}</{a}>")
    parts.append("</osmChange>")
    return "".join(parts)
