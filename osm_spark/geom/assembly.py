"""Segment joining / ring assembly / multipolygon construction.

The greedy endpoint-matching algorithm is inherently sequential per
relation, so it lives in plain Python kernels executed via
``applyInPandas`` grouped by relation id (relations are small — SURVEY
§7 "hard parts"). Semantics are ported branch-exactly from the
reference:

- join_segments        internal/mputil/join.go:4-80 (incl. the
                       first-half shift-up / second-half shift-down
                       removal and the take-from-END start segment)
- compact              join.go:82-94 (drop <=1-point segments)
- Segment.Reverse      mputil.go:19-23
- MultiSegment.Ring    mputil.go:64-101 (member-orientation logic)
- MultiSegment.Orientation  mputil.go:104-124 (origin-offset shoelace,
                       sequential summation)
- group outer/inner    mputil.go:126-185 (orientation-based reversal)
- build_polygon        osmgeojson/build_polygon.go:12-179 (old-style
                       single-outer path and multi-outer PIP assignment)
- addToMultiPolygon    build_polygon.go:181-216
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from osm_spark.geo.pip import polygon_contains_ring, ring_orientation

CCW, CW = 1, -1


@dataclass
class Segment:
    line: list[tuple[float, float]]
    index: int = 0
    orientation: int = 0  # 1 CCW, -1 CW, 0 unknown
    reversed: bool = False

    def reverse(self):
        self.reversed = not self.reversed
        self.line = self.line[::-1]

    def first(self):
        return self.line[0]

    def last(self):
        return self.line[-1]

    def copy(self):
        return Segment(list(self.line), self.index, self.orientation, self.reversed)


def compact(segments: list[Segment]) -> list[Segment]:
    """join.go:82-94: single-point/empty segments are dropped."""
    return [s for s in segments if len(s.line) > 1]


def join_segments(segments: list[Segment]) -> list[list[Segment]]:
    """join.go:4-80, order-exact: start from the LAST segment, extend the
    current multisegment at either end (reversing candidates as needed),
    bail to a new group on dangling ends."""
    segments = [s.copy() for s in compact(segments)]
    lists: list[list[Segment]] = []
    while segments:
        current = [segments.pop()]
        while segments and current[0].line[0] != current[-1].line[-1]:
            first = current[0].line[0]
            last = current[-1].line[-1]
            found_at = -1
            for i, seg in enumerate(segments):
                if last == seg.first():
                    seg = seg.copy()
                    seg.line = seg.line[1:]
                    current.append(seg)
                    found_at = i
                    break
                elif last == seg.last():
                    seg = seg.copy()
                    seg.reverse()
                    seg.line = seg.line[1:]
                    current.append(seg)
                    found_at = i
                    break
                elif first == seg.last():
                    seg = seg.copy()
                    seg.line = seg.line[:-1]
                    current.insert(0, seg)
                    found_at = i
                    break
                elif first == seg.first():
                    seg = seg.copy()
                    seg.reverse()
                    seg.line = seg.line[:-1]
                    current.insert(0, seg)
                    found_at = i
                    break
            if found_at == -1:
                break  # dangling way / unclosed ring
            segments.pop(found_at)
        lists.append(current)
    return lists


def multi_segment_linestring(ms: list[Segment]) -> list[tuple[float, float]]:
    out: list[tuple[float, float]] = []
    for s in ms:
        out.extend(s.line)
    return out


def multi_segment_orientation(ms: list[Segment]) -> int:
    """mputil.go:104-124 via the shared origin-offset kernel."""
    pts = multi_segment_linestring(ms)
    xs = np.asarray([p[0] for p in pts])
    ys = np.asarray([p[1] for p in pts])
    return ring_orientation(xs, ys)


def multi_segment_ring(ms: list[Segment], want: int) -> list[tuple[float, float]]:
    """mputil.go:64-101: prefer member orientation annotations; fall back
    to computed orientation; reverse to the wanted winding."""
    ring = multi_segment_linestring(ms)
    have_orient = False
    reversed_flag = False
    for s in ms:
        if s.orientation != 0:
            have_orient = True
            if (s.orientation == want) == s.reversed:
                reversed_flag = True
    if (have_orient and reversed_flag) or (
        not have_orient and _ring_orientation_pts(ring) != want
    ):
        ring = ring[::-1]
    return ring


def _ring_orientation_pts(pts: list[tuple[float, float]]) -> int:
    if not pts:
        return CW
    xs = np.asarray([p[0] for p in pts])
    ys = np.asarray([p[1] for p in pts])
    return ring_orientation(xs, ys)


def group_segments(
    members: list[dict], way_lines: dict[int, list[tuple[float, float]]]
) -> tuple[list[Segment], list[Segment], bool]:
    """mputil.Group (mputil.go:126-185): split way members into
    outer/inner segment lists, reversing against the member orientation;
    missing ways taint the geometry; zero-length lines are dropped.

    members: [{type, ref, role, orientation}], way_lines: ref -> line.
    """
    outer: list[Segment] = []
    inner: list[Segment] = []
    tainted = False
    for i, m in enumerate(members):
        if m.get("type") != "way":
            continue
        line = way_lines.get(m["ref"])
        if line is None:
            tainted = True
            continue
        if len(line) == 0:
            continue
        seg = Segment(list(line), index=i, orientation=int(m.get("orientation") or 0))
        if m.get("role") == "outer":
            if seg.orientation == CW:
                seg.reverse()
            outer.append(seg)
        elif m.get("role") == "inner":
            if seg.orientation == CCW:
                seg.reverse()
            inner.append(seg)
    return outer, inner, tainted


def _closed(ring: list[tuple[float, float]]) -> bool:
    return len(ring) > 0 and ring[0] == ring[-1]


def add_to_multipolygon(mp: list[list[list]], ring, include_invalid: bool):
    """build_polygon.go:181-216: assign an inner ring to the first outer
    that ray-cast-contains any of its vertices."""
    rx = np.asarray([p[0] for p in ring])
    ry = np.asarray([p[1] for p in ring])
    for poly in mp:
        outer = poly[0]
        if outer and polygon_contains_ring(
            [p[0] for p in outer], [p[1] for p in outer], rx, ry
        ):
            poly.append(ring)
            return mp
    if not include_invalid:
        return mp
    if mp:
        fr = mp[0][0]
        if fr and fr[0] != fr[-1]:
            mp[0].append(ring)
            return mp
        for poly in mp:
            if not poly[0]:
                poly.append(ring)
                return mp
    mp.append([[], ring])
    return mp


def build_multipolygon(
    members: list[dict],
    way_lines: dict[int, list[tuple[float, float]]],
    include_invalid: bool = False,
) -> dict | None:
    """build_polygon.go:12-179 geometry core (tags/feature-id handling is
    the caller's concern). Returns
    {polygons: [[ring, ...]], tainted: bool, old_style: bool} or None.
    """
    outer: list[Segment] = []
    inner: list[Segment] = []
    tainted = False
    outer_count = 0
    for i, m in enumerate(members):
        if m.get("type") != "way" or m.get("role") not in ("inner", "outer"):
            continue
        if m["role"] == "outer":
            outer_count += 1
        line = way_lines.get(m["ref"])
        if line is None:
            tainted = True
            continue
        if len(line) == 0:
            continue
        seg = Segment(list(line), index=i, orientation=int(m.get("orientation") or 0))
        if m["role"] == "outer":
            if seg.orientation == CW:
                seg.reverse()
            outer.append(seg)
        else:
            if seg.orientation == CCW:
                seg.reverse()
            inner.append(seg)

    if len(outer) == 0 and not include_invalid:
        return None
    if len(outer) == 1 and outer_count == 1:
        # old-style multipolygon: single outer way carries the tags
        outer_ring = multi_segment_ring(outer, CCW)
        if len(outer_ring) < 4 or not _closed(outer_ring):
            return None
        polygon = [outer_ring]
        for isec in join_segments(inner):
            polygon.append(multi_segment_ring(isec, CW))
        return {"polygons": [polygon], "tainted": tainted, "old_style": True}

    mp: list[list[list]] = []
    for osec in join_segments(outer):
        ring = multi_segment_ring(osec, CCW)
        if not include_invalid and (len(ring) < 4 or not _closed(ring)):
            continue
        mp.append([ring])
    if not mp and not include_invalid:
        return None
    for isec in join_segments(inner):
        ring = multi_segment_ring(isec, CW)
        mp = add_to_multipolygon(mp, ring, include_invalid)
    if not mp:
        return None
    return {"polygons": mp, "tainted": tainted, "old_style": False}


def build_route_linestrings(
    members: list[dict], way_lines: dict[int, list[tuple[float, float]]]
) -> dict:
    """convert.go:233-301 (buildRouteLineString): member ways joined into
    LineString/MultiLineString via the same greedy segment join."""
    segs: list[Segment] = []
    tainted = False
    for i, m in enumerate(members):
        if m.get("type") != "way":
            continue
        line = way_lines.get(m["ref"])
        if line is None:
            tainted = True
            continue
        if len(line) == 0:
            continue
        segs.append(Segment(list(line), index=i))
    joined = join_segments(segs)
    return {
        "lines": [multi_segment_linestring(ms) for ms in joined],
        "tainted": tainted,
    }


# ---------------------------------------------------------------- Spark layer
def assemble_multipolygons_df(relations, way_geoms, max_members: int = 20000):
    """Distributed multipolygon assembly (SURVEY §3.3 Spark shape).

    relations: (rel_id long, members array<struct<type:string, ref:long,
               role:string, orientation:int>>)
    way_geoms: (ref long, line array<struct<lon:double, lat:double>>)

    Plan: explode members -> shuffle join way geometries on ref ->
    regroup per relation -> sequential greedy assembly in an
    applyInPandas kernel (relations are small; the shuffle/regroup is
    all JVM). Returns one row per ring:
    (rel_id, poly_idx, ring_idx, ring array<struct<lon,lat>>,
     tainted, old_style).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, BooleanType, DoubleType, IntegerType, LongType,
        StructField, StructType,
    )

    exploded = relations.select(
        "rel_id", F.posexplode("members").alias("midx", "m")
    ).select(
        "rel_id",
        "midx",
        F.col("m.type").alias("mtype"),
        F.col("m.ref").alias("ref"),
        F.col("m.role").alias("role"),
        F.col("m.orientation").alias("orientation"),
    )
    joined = exploded.join(way_geoms, "ref", "left")

    out_schema = StructType(
        [
            StructField("rel_id", LongType()),
            StructField("poly_idx", IntegerType()),
            StructField("ring_idx", IntegerType()),
            StructField(
                "ring",
                ArrayType(
                    StructType(
                        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
                    )
                ),
            ),
            StructField("tainted", BooleanType()),
            StructField("old_style", BooleanType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("midx")
        rel_id = int(pdf["rel_id"].iloc[0])
        # mega-relation scale guard: the greedy ring join is a sequential
        # per-group kernel, so a coastline-sized relation (10^4-10^5
        # members) would pin one task for minutes. Cap the member list
        # and surface the truncation through the reference's own taint
        # channel (mputil.go Group's tainted flag covers exactly
        # "geometry incomplete").
        capped = len(pdf) > max_members
        if capped:
            pdf = pdf.iloc[:max_members]
        members = []
        way_lines = {}
        for r in pdf.itertuples():
            members.append(
                {
                    "type": r.mtype,
                    "ref": int(r.ref),
                    "role": r.role,
                    "orientation": int(r.orientation or 0),
                }
            )
            if r.line is not None and not (isinstance(r.line, float)):
                way_lines[int(r.ref)] = [
                    (float(p["lon"]), float(p["lat"])) for p in r.line
                ]
        res = build_multipolygon(members, way_lines)
        if res is not None and capped:
            res["tainted"] = True
        rows = []
        if res is not None:
            for pi, poly in enumerate(res["polygons"]):
                for ri, ring in enumerate(poly):
                    rows.append(
                        (
                            rel_id,
                            pi,
                            ri,
                            [{"lon": x, "lat": y} for x, y in ring],
                            res["tainted"],
                            res["old_style"],
                        )
                    )
        return pd.DataFrame(
            rows,
            columns=["rel_id", "poly_idx", "ring_idx", "ring", "tainted", "old_style"],
        )

    return joined.groupBy("rel_id").applyInPandas(kernel, schema=out_schema)


def assemble_routes_df(relations, way_geoms, max_members: int = 20000):
    """Distributed route-linestring assembly (convert.go:233-301 via the
    same explode -> join -> applyInPandas shape as multipolygons).

    relations: (rel_id long, members array<struct<type:string, ref:long,
               role:string, orientation:int>>)
    way_geoms: (ref long, line array<struct<lon:double, lat:double>>)

    Returns one row per joined line:
    (rel_id, line_idx, line array<struct<lon,lat>>, tainted).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, BooleanType, DoubleType, IntegerType, LongType,
        StructField, StructType,
    )

    exploded = relations.select(
        "rel_id", F.posexplode("members").alias("midx", "m")
    ).select(
        "rel_id",
        "midx",
        F.col("m.type").alias("mtype"),
        F.col("m.ref").alias("ref"),
    )
    joined = exploded.join(way_geoms, "ref", "left")

    out_schema = StructType(
        [
            StructField("rel_id", LongType()),
            StructField("line_idx", IntegerType()),
            StructField(
                "line",
                ArrayType(
                    StructType(
                        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
                    )
                ),
            ),
            StructField("tainted", BooleanType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("midx")
        rel_id = int(pdf["rel_id"].iloc[0])
        # same mega-relation guard as assemble_multipolygons_df
        capped = len(pdf) > max_members
        if capped:
            pdf = pdf.iloc[:max_members]
        members = []
        way_lines = {}
        for r in pdf.itertuples():
            members.append({"type": r.mtype, "ref": int(r.ref)})
            if r.line is not None and not isinstance(r.line, float):
                way_lines[int(r.ref)] = [
                    (float(p["lon"]), float(p["lat"])) for p in r.line
                ]
        res = build_route_linestrings(members, way_lines)
        if capped:
            res["tainted"] = True
        rows = [
            (rel_id, li, [{"lon": x, "lat": y} for x, y in line], res["tainted"])
            for li, line in enumerate(res["lines"])
        ]
        return pd.DataFrame(rows, columns=["rel_id", "line_idx", "line", "tainted"])

    return joined.groupBy("rel_id").applyInPandas(kernel, schema=out_schema)
