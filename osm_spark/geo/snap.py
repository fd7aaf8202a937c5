"""Snap points to their nearest road segment (map matching).

The reference's way/node model exists so consumers can resolve ways
into segment chains and match observations onto them (the
orb/planar.DistanceFromSegment + project primitive under every OSM
router's snap step).  This module is the distributed form: snap EVERY
point of a corpus to its nearest segment within a matching radius —
no per-query driver state, unlike the kNN operators whose query sets
are parameter-sized.

Exactness contract (what makes the pruned join == brute force):

- Everything lives on a uniform planar micro-degree grid with
  power-of-two cells of ``2^shift`` µdeg (no Mercator, no
  transcendentals anywhere in this operator).
- Each segment indexes under EVERY grid cell it passes through — the
  same fixed-point supercover construction as geo/raster_line.py, but
  the e6 coordinate already IS the fixed-point value, so the gridline
  walk needs no quantization step at all.
- Each point probes its 3x3 cell neighborhood.  Any segment whose
  closest approach to the point is within ``2^shift`` µdeg passes
  through a cell of that neighborhood (the closest-approach point lies
  within +/- one cell of the point's cell), so for any snap radius
  ``max_dist <= 2^shift`` the candidate set provably contains the true
  nearest-within-radius segment.  The DuckDB oracle brute-forces ALL
  point x segment pairs — the two derivations share no pruning logic,
  so the cross-check covers the completeness of the index, not just
  the distance formula.
- The point-segment distance is double +,-,*,/ with least/greatest
  clamping only — IEEE-identical between the JVM and DuckDB — and
  every emitted value is floor-quantized int64, so the argmin and the
  snapped coordinates match bit-for-bit.

Scale shape: the segment index is |segments| x cells-per-segment rows
(short road segments touch 1-4 cells); points explode exactly 9x; the
join is a 2-int-key equi-join (broadcast when the road network is the
small side, shuffle otherwise); the argmin is one min(struct) per
point with map-side partial aggregation.  No iteration, no collect —
scan-shaped at 10^12 points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Per-axis segment-extent bound (µdeg) for _fld exactness: the int64
# numerator in segment_cells is (gv - lo_m) * (hi_o - lo_o), bounded by
# extent_main * extent_other, and the double round-trip in _fld is only
# exact while that PRODUCT (not the quotient) stays below 2^53 —
# so each axis extent must stay <= 2^26 µdeg (~67 degrees, far above
# any real road segment).  segment_cells enforces this row-wise.
_MAX_SEG_EXTENT = 1 << 26


def _fld(a: Column, b: Column) -> Column:
    """Exact floor division (divisor > 0): subtracting the positive mod
    makes the numerator exactly divisible, so the double round-trip of
    `/` is exact while the NUMERATOR `a` is exactly representable,
    i.e. |a| < 2^53 (callers bound it via _MAX_SEG_EXTENT; the
    quotient is then also < 2^53 automatically)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def segment_cells(segs: DataFrame, shift: int, id_col: str = "seg_id") -> DataFrame:
    """(seg_id, ax, ay, bx, by int64 µdeg) -> one row per grid cell the
    segment passes through, geometry carried along: (seg_id, cx, cy,
    ax, ay, bx, by).  Cells are ``2^shift`` µdeg squares; the gridline
    walk is the raster_line.py supercover on raw e6 coordinates."""
    Q = 1 << shift
    geom = [F.col(id_col), F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")]
    # row-wise exactness guard (see _MAX_SEG_EXTENT): a segment longer
    # than 2^26 µdeg on either axis would silently break _fld's
    # floor-division exactness and void the provably-exact candidate
    # set; fail loudly instead.  A filter (not a projected column) so
    # the optimizer cannot prune the check.
    segs = segs.filter(
        F.when(
            (F.abs(F.col("bx") - F.col("ax")) <= F.lit(_MAX_SEG_EXTENT))
            & (F.abs(F.col("by") - F.col("ay")) <= F.lit(_MAX_SEG_EXTENT)),
            F.lit(True),
        ).otherwise(
            F.raise_error(
                "segment extent exceeds 2^26 µdeg: _fld exactness bound"
            )
        )
    )

    def crossings(a_main, a_other, b_main, b_other, flip: bool):
        lo_m = F.least(a_main, b_main)
        lo_o = F.when(a_main <= b_main, a_other).otherwise(b_other)
        hi_m = F.greatest(a_main, b_main)
        hi_o = F.when(a_main <= b_main, b_other).otherwise(a_other)
        g1 = F.shiftright(lo_m, shift) + 1
        g2 = F.shiftright(hi_m, shift)

        def cell(g):
            gv = g.cast("long") * F.lit(Q)
            o = lo_o + _fld((gv - lo_m) * (hi_o - lo_o), hi_m - lo_m)
            oc = F.shiftright(o, shift)
            a = F.struct((g - 1).cast("long").alias("m"), oc.alias("o"))
            b = F.struct(g.cast("long").alias("m"), oc.alias("o"))
            return F.array(a, b)

        pairs = F.when(
            (hi_m > lo_m) & (g2 >= g1),
            F.flatten(F.transform(F.sequence(g1, g2), cell)),
        ).otherwise(F.array().cast("array<struct<m:bigint,o:bigint>>"))
        if flip:
            return F.transform(
                pairs, lambda s: F.struct(s["o"].alias("x"), s["m"].alias("y"))
            )
        return F.transform(
            pairs, lambda s: F.struct(s["m"].alias("x"), s["o"].alias("y"))
        )

    ends = F.array(
        F.struct(
            F.shiftright("ax", shift).alias("x"),
            F.shiftright("ay", shift).alias("y"),
        ),
        F.struct(
            F.shiftright("bx", shift).alias("x"),
            F.shiftright("by", shift).alias("y"),
        ),
    )
    allcells = F.concat(
        ends,
        crossings(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"), False),
        crossings(F.col("ay"), F.col("ax"), F.col("by"), F.col("bx"), True),
    )
    return (
        segs.select(*geom, F.explode(allcells).alias("c"))
        .select(
            *geom, F.col("c.x").alias("cx"), F.col("c.y").alias("cy")
        )
        .distinct()
    )


def _seg_dist2(px, py, ax, ay, bx, by) -> tuple[Column, Column, Column]:
    """(d2, sx, sy): squared planar distance from point to segment and
    the snapped (closest) coordinates, all double +,-,*,/ with clamp —
    IEEE-identical across engines.  Zero-length segments collapse to
    their endpoint."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t_raw = ((px - ax) * dx + (py - ay) * dy) / len2
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    sx = F.when(len2 == 0.0, ax).otherwise(ax + t * dx)
    sy = F.when(len2 == 0.0, ay).otherwise(ay + t * dy)
    d2 = (px - sx) * (px - sx) + (py - sy) * (py - sy)
    return d2, sx, sy


def snap_candidates(
    points: DataFrame,
    segs: DataFrame,
    shift: int = 19,
    max_d2: float = float(400_000**2),
    point_id: str = "pid",
) -> DataFrame:
    """ALL (pid, seg_id, d2, sx, sy) candidate matches within
    sqrt(max_d2) µdeg — the complete within-radius candidate set the
    3x3 cell probe guarantees for radius <= 2^shift (raised
    otherwise; a bare assert would be stripped under python -O and
    return silently-wrong matches).  One row per (point, segment)
    pair (segments spanning several probed cells are deduplicated);
    ``sx``/``sy`` are the floor-quantized snapped coordinates.
    :func:`snap_points` reduces this to the per-point argmin; the
    Viterbi map matcher (geo/matching.py) consumes it whole."""
    if max_d2 > float((1 << shift)) ** 2:
        raise ValueError(
            f"snap radius sqrt({max_d2}) exceeds the 2^{shift} µdeg cell "
            "size: the 3x3 probe would return incomplete nearest-segment "
            "matches"
        )
    idx = segment_cells(segs, shift)
    probes = points.select(
        point_id,
        "px",
        "py",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dx: F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dy: F.struct(
                            (F.shiftright("px", shift) + dx).alias("cx"),
                            (F.shiftright("py", shift) + dy).alias("cy"),
                        ),
                    ),
                )
            )
        ).alias("c"),
    ).select(point_id, "px", "py", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    d2, sx, sy = _seg_dist2(
        F.col("px").cast("double"), F.col("py").cast("double"),
        F.col("ax").cast("double"), F.col("ay").cast("double"),
        F.col("bx").cast("double"), F.col("by").cast("double"),
    )
    cand = (
        probes.join(idx, ["cx", "cy"])
        .select(
            point_id,
            F.col("seg_id"),
            d2.alias("d2"),
            F.floor(sx).cast("long").alias("sx"),
            F.floor(sy).cast("long").alias("sy"),
        )
        .where(F.col("d2") <= F.lit(max_d2))
        # a segment crossing several probed cells appears once per
        # cell; candidates are (point, segment) pairs
        .groupBy(point_id, "seg_id")
        .agg(
            F.first("d2").alias("d2"),
            F.first("sx").alias("sx"),
            F.first("sy").alias("sy"),
        )
    )
    return cand


def snap_points(
    points: DataFrame,
    segs: DataFrame,
    shift: int = 19,
    max_d2: float = float(400_000**2),
    point_id: str = "pid",
) -> DataFrame:
    """Snap each (pid, px, py) to the nearest (seg_id, ax, ay, bx, by)
    within sqrt(max_d2) µdeg.  Returns one row per point:
    (pid, seg_id, matched, d2_q, snap_x, snap_y) — unmatched points
    keep their own coordinates and carry seg_id = -1, d2_q = -1."""
    cand = snap_candidates(points, segs, shift, max_d2, point_id)
    best = cand.groupBy(point_id).agg(
        F.min(F.struct("d2", "seg_id", "sx", "sy")).alias("b")
    )
    return points.join(best, point_id, "left").select(
        point_id,
        F.coalesce(F.col("b.seg_id"), F.lit(-1)).cast("long").alias("seg_id"),
        F.col("b.d2").isNotNull().cast("int").alias("matched"),
        F.coalesce(F.floor(F.col("b.d2")), F.lit(-1)).cast("long").alias("d2_q"),
        F.coalesce(F.col("b.sx"), F.col("px")).cast("long").alias("snap_x"),
        F.coalesce(F.col("b.sy"), F.col("py")).cast("long").alias("snap_y"),
    )
