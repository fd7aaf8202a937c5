"""Hex polyfill: polygon -> the hex cells whose centers it contains.

H3's ``polyfill`` semantics (center containment) over the repo's
aperture-7 hex index (geo/hex.py) — the missing third leg of the hex
family: point->cell (h3_assign), cell->neighborhood (k-ring), and now
region->cells, the operator that turns polygon layers (admin areas,
coverage zones) into hex keys so polygon joins become cell equi-joins.
The reference's analog is its tile.Range bbox cover (maptile/tile.go)
— polyfill is the hex-exact version of that cover, trimmed to the
polygon interior.

Spark-first shape, zero Python:

- A cell's CENTER at resolution R has fractional axial coordinates
  exactly equal to its integer (q, r) — so the candidate cells whose
  centers can fall inside the polygon's lon/lat bbox are precisely the
  integer points of the bbox's image under the (linear) axial
  transform, a parallelogram; its axial bounding box is the min/max
  over the four corners.  Candidates enumerate as one
  explode(sequence) per axis (+-1 float-safety margin), in-row.
- The center's lon/lat comes from the CLOSED-FORM inverse: M^R has
  integer entries (a, b, c, d) with det 7^R, so
  q0 = (d*q - b*r)/7^R, r0 = (-c*q + a*r)/7^R — adjugate over an
  exact power, no matrix inverse, the identical expression (same IEEE
  op order) runs in the SQL oracle.
- Containment is an EXACT INTEGER ray cast over quantized µdeg: the
  center quantizes once (floor(x*1e6), the repo's standard
  transcendental boundary) and each polygon edge contributes via the
  sign of t = (xj-xi)(py-yi) - (px-xi)(yj-yi) against the edge's y
  direction — a zip_with + aggregate over the in-row vertex array,
  whole-stage codegen, bit-identical in DuckDB.

At 10^12 scale: the explode factor is the polygon's bbox cell count at
the chosen resolution (pick R so it stays bounded; continent-sized
polygons at fine R are the skew hazard — polyfill coarse, then refine
children of boundary cells).  No joins, no shuffle — the output is
scan-shaped per polygon row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import hex as H


def _axial_f(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Fractional axial coords at ``res`` — the shared op-order-pinned
    helper (hex_spark.frac_axial_cols / hex.frac_axial_sql twins)."""
    from osm_spark.geo.hex_spark import frac_axial_cols

    return frac_axial_cols(lat, lon, res)


def center_lonlat(q: Column, r: Column, res: int) -> tuple[Column, Column]:
    """(lon, lat) of the res-R cell (q, r) center — adjugate of M^R
    over det 7^R, then the inverse res-0 transform.  Keep this op
    order in any SQL twin."""
    a, b, c, d = H.m_pow(res)
    det = float(7 ** res)
    q0 = (F.lit(float(d)) * q - F.lit(float(b)) * r) / F.lit(det)
    r0 = (F.lit(float(-c)) * q + F.lit(float(a)) * r) / F.lit(det)
    lat = r0 / F.lit(H.C3)
    lon = (q0 + lat * F.lit(H.C2)) / F.lit(H.C1)
    return lon, lat


def center_lonlat_sql(q: str, r: str, res: int) -> tuple[str, str]:
    """SQL twin of :func:`center_lonlat` (identical op order)."""
    a, b, c, d = H.m_pow(res)
    det = float(7 ** res)
    q0 = f"(({float(d)!r} * ({q}) - {float(b)!r} * ({r})) / {det!r})"
    r0 = f"(({float(-c)!r} * ({q}) + {float(a)!r} * ({r})) / {det!r})"
    lat = f"({r0} / {H.C3!r})"
    lon = f"(({q0} + {lat} * {H.C2!r}) / {H.C1!r})"
    return lon, lat


def ray_cast_int(verts: Column, px: Column, py: Column) -> Column:
    """Exact int64 ray-cast containment of point (px, py) in the ring
    ``verts`` (array<struct<x:long, y:long>>, unclosed).  Edge k runs
    vertex k-1 -> k; the (yi > py) != (yj > py) gate gives the standard
    half-open vertex/horizontal-edge handling, and the crossing side
    comes from sign(t) vs the edge's y direction — no division, no
    floats, products bounded by |coord|^2 < 2^63 for any µdeg input."""
    prev = F.concat(
        F.slice(verts, -1, 1), F.slice(verts, 1, F.size(verts) - 1)
    )
    def edge_hit(v: Column, p: Column) -> Column:
        yi, yj = p["y"], v["y"]
        t = (v["x"] - p["x"]) * (py - yi) - (px - p["x"]) * (yj - yi)
        return F.when(
            ((yi > py) != (yj > py))
            & (F.when(yj > yi, t > 0).otherwise(t < 0)),
            F.lit(1),
        ).otherwise(F.lit(0))

    crossings = F.aggregate(
        F.zip_with(verts, prev, edge_hit), F.lit(0), lambda acc, x: acc + x
    )
    return crossings % 2 == 1


def hex_compact(
    cells: DataFrame,
    res: int,
    id_col: str = "poly_id",
    min_res: int = 0,
) -> DataFrame:
    """H3 compactCells semantics: (id, q, r) cells all at resolution
    ``res`` -> the minimal mixed-resolution covering set
    (id, res, q, r), where every COMPLETE 7-child set is replaced by
    its parent, recursively.

    Parent = hexround(M^-1 @ child) is exact on integer axial coords
    (hex.py digit-chain invariant), so a complete sibling set is just
    a parent-keyed group of size 7.  Per level: one groupBy + one
    anti-join; the loop is bounded by the RESOLUTION (<= 15 levels),
    never by data, and each level's frame shrinks 7x where compaction
    fires.  Promoted parents re-enter the next level, so interiors
    collapse all the way up while the boundary fringe stays fine.
    Each level's frame eagerly localCheckpoints (the components.py
    round pattern): ``cur`` feeds both the group and the anti-join, so
    without truncation the analyzed plan doubles per level."""
    from osm_spark.geo.hex_spark import parent_axial_cols

    kept = []
    cur = cells.select(id_col, F.lit(res).alias("res"), "q", "r")
    for rv in range(res, min_res, -1):
        pq, pr = parent_axial_cols(F.col("q"), F.col("r"))
        with_p = cur.select(
            id_col, "res", "q", "r", pq.alias("pq"), pr.alias("pr")
        ).localCheckpoint()
        full = (
            with_p.groupBy(id_col, "pq", "pr")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") == 7)
            .drop("n")
        )
        kept.append(
            with_p.join(full, [id_col, "pq", "pr"], "left_anti")
            .select(id_col, "res", "q", "r")
        )
        cur = full.select(
            id_col, F.lit(rv - 1).alias("res"),
            F.col("pq").alias("q"), F.col("pr").alias("r"),
        )
    out = cur
    for k in kept:
        out = out.unionByName(k)
    return out


def hex_cover_join(
    points: DataFrame,
    cover: DataFrame,
    res: int,
    q_col: str = "q",
    r_col: str = "r",
) -> DataFrame:
    """Join points against a COMPACTED mixed-resolution cover
    (hex_compact output: id, res, q, r) — the reason compact exists:
    a polygon layer polyfilled fine and compacted coarse broadcasts in
    O(boundary) cells, and each point probes it once per resolution
    level via its ancestor chain (pure column math, no UDF).

    ``points`` carries the finest-res cell in (q_col, r_col); the
    ancestor chain res..0 builds level by level as NAMED columns (each
    hexround references its inputs ~10x, so a chained single
    expression would grow ~10^levels nodes and overflow Catalyst's
    tree walk — attribute references per level keep it linear), then
    explodes to res+1 probe rows, and the equi-join on (res, q, r)
    hits at most ONE cover cell per point per cover id (compact covers
    are disjoint across levels by construction).  Broadcast the small
    side; the points never shuffle."""
    from osm_spark.geo.hex_spark import parent_axial_cols

    if "res" in points.columns:
        raise ValueError(
            "hex_cover_join: the points frame already carries a 'res' "
            "column, which would collide with the probe level — rename "
            "it before joining"
        )
    pts0 = points
    qc, rc = q_col, r_col
    levels = [(res, qc, rc)]
    for rv in range(res - 1, -1, -1):
        pq, pr = parent_axial_cols(F.col(qc), F.col(rc))
        qc, rc = f"_q{rv}", f"_r{rv}"
        pts0 = pts0.select("*", pq.alias(qc), pr.alias(rc))
        levels.append((rv, qc, rc))
    anc = F.array(*[
        F.struct(
            F.lit(rv).cast("int").alias("res"),
            F.col(qn).alias("q"), F.col(rn).alias("r"),
        )
        for rv, qn, rn in levels
    ])
    pts = (
        pts0.withColumn("_a", F.explode(anc))
        .drop(*[qn for _, qn, _ in levels], *[rn for _, _, rn in levels])
        .select("*", "_a.res", "_a.q", "_a.r")
        .drop("_a")
    )
    key = ["res", "q", "r"]
    cov = cover.withColumn("res", F.col("res").cast("int"))
    return pts.join(F.broadcast(cov), key).drop(*key)


def hex_polyfill(
    polys: DataFrame,
    res: int,
    id_col: str = "poly_id",
    verts_col: str = "verts",
) -> DataFrame:
    """(poly_id, verts array<struct<x:long,y:long>> µdeg) ->
    (poly_id, q, r): every res-R hex cell whose center lies inside the
    polygon, center-containment semantics (H3 polyfill)."""
    xs = F.transform(verts_col, lambda v: v["x"])
    ys = F.transform(verts_col, lambda v: v["y"])
    d = polys.select(
        F.col(id_col),
        F.col(verts_col).alias("_verts"),
        (F.array_min(xs) / F.lit(1000000.0)).alias("lon_lo"),
        (F.array_max(xs) / F.lit(1000000.0)).alias("lon_hi"),
        (F.array_min(ys) / F.lit(1000000.0)).alias("lat_lo"),
        (F.array_max(ys) / F.lit(1000000.0)).alias("lat_hi"),
    )
    corners = [
        _axial_f(F.col(lo), F.col(la), res)
        for lo in ("lon_lo", "lon_hi")
        for la in ("lat_lo", "lat_hi")
    ]
    qlo = F.floor(F.least(*[c[0] for c in corners])).cast("long") - 1
    qhi = F.floor(F.greatest(*[c[0] for c in corners])).cast("long") + 1
    rlo = F.floor(F.least(*[c[1] for c in corners])).cast("long") - 1
    rhi = F.floor(F.greatest(*[c[1] for c in corners])).cast("long") + 1
    cand = d.select(
        id_col, "_verts",
        F.explode(F.sequence(qlo, qhi)).alias("q"),
        rlo.alias("_rlo"), rhi.alias("_rhi"),
    ).select(
        id_col, "_verts", "q",
        F.explode(F.sequence("_rlo", "_rhi")).alias("r"),
    )
    lon, lat = center_lonlat(F.col("q"), F.col("r"), res)
    cand = cand.select(
        id_col, "_verts", "q", "r",
        F.floor(lon * F.lit(1000000.0)).cast("long").alias("cx"),
        F.floor(lat * F.lit(1000000.0)).cast("long").alias("cy"),
    )
    return cand.where(
        ray_cast_int(F.col("_verts"), F.col("cx"), F.col("cy"))
    ).select(id_col, "q", "r")
