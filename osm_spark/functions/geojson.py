"""GeoJSON feature emission — osmgeojson.Convert's output layer.

Ports the feature-building semantics branch-exact from the reference
(osmgeojson/convert.go):

- nodeToFeature (convert.go:165-183): empty-node skip (lat==lon==0 and
  version==0), Point geometry, id "node/<id>", properties id/type/tags.
- wayToFeature (convert.go:201-231): one-node ways skipped, Polygon()
  ways close+reorient to a CCW ring, others LineString; tainted flag
  when a way node can't resolve.
- addMetaProperties (convert.go:~300): zero-valued meta fields are
  OMITTED (version 0, changeset 0, empty user, uid 0, zero timestamp);
  "relations" is always present (possibly []) unless disabled.
- relationSummary {id, role, tags} (convert.go:27-31), built per
  member from the relation's tags (convert.go:60-95).

The Python kernel builds feature dicts; the Spark operator applies it
batch-wise via mapInPandas, emitting canonical JSON strings
(sort_keys, compact separators — deterministic across runs/engines).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from osm_spark.geo.pip import ring_orientation


def relation_summaries(members: list[dict]) -> list[dict]:
    """[{id, role, tags}] in member order (convert.go:84-89)."""
    return [
        {"id": m["rel_id"], "role": m.get("role", ""), "tags": m.get("tags") or {}}
        for m in members
    ]


def _meta(element: dict) -> dict:
    meta = {}
    if element.get("ts") is not None:
        meta["timestamp"] = str(element["ts"])
    if element.get("version"):
        meta["version"] = int(element["version"])
    if element.get("changeset"):
        meta["changeset"] = int(element["changeset"])
    if element.get("user"):
        meta["user"] = element["user"]
    if element.get("uid"):
        meta["uid"] = int(element["uid"])
    return meta


def _common_props(element: dict, etype: str, relations: list[dict] | None,
                  no_meta: bool, no_rel: bool) -> dict:
    props = {
        "id": int(element["id"]),
        "type": etype,
        "tags": element.get("tags") or {},
    }
    if not no_rel:
        props["relations"] = relations or []
    if not no_meta:
        props["meta"] = _meta(element)
    return props


def node_feature(node: dict, relations: list[dict] | None = None,
                 no_id: bool = False, no_meta: bool = False,
                 no_rel: bool = False) -> dict | None:
    """convert.go:165-183 nodeToFeature."""
    if not node.get("lat") and not node.get("lon") and not node.get("version"):
        return None
    f = {
        "type": "Feature",
        "geometry": {
            "type": "Point",
            "coordinates": [node["lon"], node["lat"]],
        },
        "properties": _common_props(node, "node", relations, no_meta, no_rel),
    }
    if not no_id:
        f["id"] = f"node/{int(node['id'])}"
    return f


def way_feature(way: dict, line: list[tuple[float, float]],
                is_polygon: bool, tainted: bool,
                relations: list[dict] | None = None,
                no_id: bool = False, no_meta: bool = False,
                no_rel: bool = False) -> dict | None:
    """convert.go:201-231 wayToFeature: LineString, or Polygon for
    area ways (ring closed + reoriented CCW like reorient())."""
    if len(line) <= 1:
        return None
    if is_polygon:
        ring = list(line)
        if ring[0] != ring[-1]:
            ring.append(ring[0])
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        if ring_orientation(xs, ys) < 0:  # CW -> reverse to CCW
            ring.reverse()
        geometry = {"type": "Polygon", "coordinates": [[list(p) for p in ring]]}
    else:
        geometry = {"type": "LineString", "coordinates": [list(p) for p in line]}
    f = {
        "type": "Feature",
        "geometry": geometry,
        "properties": _common_props(way, "way", relations, no_meta, no_rel),
    }
    if tainted:
        f["properties"]["tainted"] = True
    if not no_id:
        f["id"] = f"way/{int(way['id'])}"
    return f


def relation_feature(rel: dict, geometry: dict,
                     relations: list[dict] | None = None,
                     tainted: bool = False,
                     no_id: bool = False, no_meta: bool = False,
                     no_rel: bool = False) -> dict:
    """Relation-feature wrapper (convert.go:284-299): geometry is
    supplied by the caller (route LineString/MultiLineString from
    buildRouteLineString, or the assembled multipolygon from
    geom/assembly.py); id/meta/relations emission shares
    _common_props with nodes and ways so the NoID/NoMeta/
    NoRelationMembership options behave identically across element
    types (options.go:7-31, options_test.go)."""
    f = {
        "type": "Feature",
        "geometry": geometry,
        "properties": _common_props(rel, "relation", relations,
                                    no_meta, no_rel),
    }
    if tainted:
        f["properties"]["tainted"] = True
    if not no_id:
        f["id"] = f"relation/{int(rel['id'])}"
    return f


def feature_json(feature: dict) -> str:
    """Canonical JSON: sorted keys, compact separators."""
    return json.dumps(feature, sort_keys=True, separators=(",", ":"))


def node_features_df(nodes: DataFrame, memberships: DataFrame | None = None,
                     no_id: bool = False, no_meta: bool = False,
                     no_rel: bool = False) -> DataFrame:
    """Distributed node-feature emission.

    nodes: (id, lat, lon, version, changeset, ts nullable, user nullable,
            uid nullable, tags map<string,string> nullable)
    memberships: (ref, rel_id, role, tags map) — node relation
    membership (convert.go relationMember), joined + collected per node.

    Returns (id, feature) with feature = canonical GeoJSON string. Plan:
    optional membership aggregation (one |memberships| shuffle) + left
    join + one mapInPandas pass; no other shuffle.
    """
    if memberships is not None:
        rels = memberships.groupBy(F.col("ref").alias("id")).agg(
            F.collect_list(
                F.struct(
                    F.col("rel_id").alias("rel_id"),
                    F.col("role").alias("role"),
                    F.col("tags").alias("tags"),
                )
            ).alias("_rels")
        )
        nodes = nodes.join(rels, "id", "left")
    else:
        nodes = nodes.withColumn(
            "_rels",
            F.lit(None).cast(
                "array<struct<rel_id:long, role:string, tags:map<string,string>>>"
            ),
        )

    schema = StructType(
        [StructField("id", nodes.schema["id"].dataType),
         StructField("feature", StringType())]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_feats = [], []
            # dict records, not itertuples: pandas renames underscore-
            # prefixed columns (_rels) to positional names in tuples
            for row in pdf.to_dict("records"):
                mrows = row.get("_rels")
                rels = None
                if mrows is None or (
                    not isinstance(mrows, (list, tuple, np.ndarray))
                ):
                    mrows = None
                if mrows is not None and len(mrows):
                    rels = relation_summaries(
                        [
                            {
                                "rel_id": int(m["rel_id"]),
                                "role": m["role"],
                                "tags": dict(m["tags"]) if m["tags"] else {},
                            }
                            for m in mrows
                        ]
                    )
                node = {
                    "id": row["id"],
                    "lat": row["lat"],
                    "lon": row["lon"],
                    "version": row.get("version"),
                    "changeset": row.get("changeset"),
                    "ts": row.get("ts"),
                    "user": row.get("user"),
                    "uid": row.get("uid"),
                    "tags": dict(row["tags"]) if row.get("tags") else {},
                }
                f = node_feature(node, rels, no_id=no_id,
                                 no_meta=no_meta, no_rel=no_rel)
                if f is None:
                    continue
                out_ids.append(row["id"])
                out_feats.append(feature_json(f))
            yield pd.DataFrame({"id": out_ids, "feature": out_feats})

    return nodes.mapInPandas(gen, schema=schema)


def way_features_df(ways: DataFrame, memberships: DataFrame | None = None,
                    no_id: bool = False, no_meta: bool = False,
                    no_rel: bool = False) -> DataFrame:
    """Distributed way-feature emission (wayToFeature applied batch-wise).

    ways: (id, line array<struct<lon:double, lat:double>>, is_polygon
    boolean, tainted boolean [, version, changeset, tags]).
    memberships: (ref, rel_id, role, tags) like node_features_df.

    Returns (id, feature). One optional membership aggregation + one
    mapInPandas pass; one-node ways drop (convert.go:203-206).
    """
    if memberships is not None:
        rels = memberships.groupBy(F.col("ref").alias("id")).agg(
            F.collect_list(
                F.struct(
                    F.col("rel_id").alias("rel_id"),
                    F.col("role").alias("role"),
                    F.col("tags").alias("tags"),
                )
            ).alias("_rels")
        )
        ways = ways.join(rels, "id", "left")
    else:
        ways = ways.withColumn(
            "_rels",
            F.lit(None).cast(
                "array<struct<rel_id:long, role:string, tags:map<string,string>>>"
            ),
        )

    schema = StructType(
        [StructField("id", ways.schema["id"].dataType),
         StructField("feature", StringType())]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_feats = [], []
            for row in pdf.to_dict("records"):
                mrows = row.get("_rels")
                rels = None
                if isinstance(mrows, (list, tuple, np.ndarray)) and len(mrows):
                    rels = relation_summaries(
                        [
                            {
                                "rel_id": int(m["rel_id"]),
                                "role": m["role"],
                                "tags": dict(m["tags"]) if m["tags"] else {},
                            }
                            for m in mrows
                        ]
                    )
                lrows = row.get("line")
                if lrows is None or not isinstance(
                    lrows, (list, tuple, np.ndarray)
                ):
                    lrows = []
                line = [(float(p["lon"]), float(p["lat"])) for p in lrows]
                way = {
                    "id": row["id"],
                    "version": row.get("version"),
                    "changeset": row.get("changeset"),
                    "tags": dict(row["tags"]) if row.get("tags") else {},
                }
                f = way_feature(
                    way, line, bool(row.get("is_polygon")),
                    bool(row.get("tainted")), rels,
                    no_id=no_id, no_meta=no_meta, no_rel=no_rel,
                )
                if f is None:
                    continue
                out_ids.append(row["id"])
                out_feats.append(feature_json(f))
            yield pd.DataFrame({"id": out_ids, "feature": out_feats})

    return ways.mapInPandas(gen, schema=schema)
