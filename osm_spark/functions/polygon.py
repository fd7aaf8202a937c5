"""Way.Polygon() — the area heuristic deciding whether a closed way is a
polygon (reference polygon.go:14-53 + the Overpass-turbo condition table
polygon.go:85-238).

Logic (exact):
1. > 3 nodes (first/last repeated) and closed (first ref == last ref);
2. tag ``area=no`` vetoes, any other non-empty ``area`` forces true;
3. otherwise the first matching entry of the condition table wins:
   - ``all``: any non-empty value other than 'no'
   - ``whitelist``: value in list
   - ``blacklist``: value NOT in list
   (a '' or 'no' value for a key never matches — polygon.go:32-35).

Compiled to a single boolean column expression (CASE chain over
element_at lookups) — JVM-side, codegen-friendly, no UDF and no join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# polygon.go:85-238 — (key, condition, values)
POLY_CONDITIONS: list[tuple[str, str, list[str] | None]] = [
    ("building", "all", None),
    ("highway", "whitelist", ["services", "rest_area", "escape", "elevator"]),
    ("natural", "blacklist", ["coastline", "cliff", "ridge", "arete", "tree_row"]),
    ("landuse", "all", None),
    ("waterway", "whitelist", ["riverbank", "dock", "boatyard", "dam"]),
    ("amenity", "all", None),
    ("leisure", "all", None),
    ("barrier", "whitelist",
     ["city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes"]),
    ("railway", "whitelist", ["station", "turntable", "roundhouse", "platform"]),
    ("boundary", "all", None),
    ("man_made", "blacklist", ["cutline", "embankment", "pipeline"]),
    ("power", "whitelist", ["plant", "substation", "generator", "transformer"]),
    ("place", "all", None),
    ("shop", "all", None),
    ("aeroway", "blacklist", ["taxiway"]),
    ("tourism", "all", None),
    ("historic", "all", None),
    ("public_transport", "all", None),
    ("office", "all", None),
    ("building:part", "all", None),
    ("military", "all", None),
    ("ruins", "all", None),
    ("area:highway", "all", None),
    ("craft", "all", None),
    ("golf", "all", None),
    ("indoor", "all", None),
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tags_polygon_condition(tags) -> Column:
    """The condition-table part only (steps 2-3), over a map column."""
    tags = _col(tags)
    area = F.coalesce(F.element_at(tags, "area"), F.lit(""))
    matched = F.lit(False)
    for key, cond, values in POLY_CONDITIONS:
        v = F.coalesce(F.element_at(tags, key), F.lit(""))
        present = (v != "") & (v != "no")
        if cond == "all":
            hit = present
        elif cond == "whitelist":
            hit = present & v.isin(values)
        else:  # blacklist
            hit = present & ~v.isin(values)
        matched = matched | hit
    return F.when(area == "no", F.lit(False)).otherwise(
        F.when(area != "", F.lit(True)).otherwise(matched)
    )


def way_is_polygon(nodes, tags) -> Column:
    """Full Way.Polygon() (polygon.go:14-53). ``nodes`` is the
    array<struct<ref,...>> column; closed-ness compares first/last ref."""
    nodes = _col(nodes)
    closed = (F.size(nodes) > 3) & (
        nodes[0]["ref"] == F.element_at(nodes, -1)["ref"]
    )
    return closed & tags_polygon_condition(tags)
