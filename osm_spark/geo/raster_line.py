"""Supercover line rasterization: every tile a segment crosses.

The way→tile assignment a render/index path needs (the reference's
maptile consumers assign way geometries to the tiles they touch, not
just their endpoints' tiles): for each segment, emit every z-level
tile the segment passes through.

Fixed-point construction so Spark and the SQL oracle agree exactly:

- Endpoint tile FRACTIONS (geo/tiles.py fraction_x/fraction_y — the
  only transcendentals) are quantized ONCE to int64 sub-tile units
  (``qbits`` fractional bits).  Everything after is exact integer
  arithmetic.
- For every integer gridline between the endpoints, the crossing
  ordinate interpolates as ``ya + fld((g·Q − xa)·(yb − ya), xb − xa)``
  with fld = FLOOR division, emitting the two cells either side of the
  crossing; endpoint cells are always included; DISTINCT closes the
  set.  Floor division is expressed as ``(a − pmod(a, b)) / b`` on the
  Spark side (the subtraction makes the numerator exactly divisible,
  so `/`'s double round-trip is exact — quotients here are < 2^24) and
  as ``//`` in DuckDB (floors for positive divisors); both equal fld
  for every sign of the numerator.
- Per-axis the endpoints are ordered by the axis coordinate, so the
  divisor is strictly positive and the gridline walk is a bounded
  in-row sequence — the whole operator is one explode + one DISTINCT,
  no joins, no Python.

At 10^12 segments this is scan-shaped: cells-per-segment is bounded by
the segment's tile span (the explode factor), and the DISTINCT is the
only exchange — keyed on (seg, x, y).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import tiles


def _fld(a: Column, b: Column) -> Column:
    """Floor division for int64 columns, exact: subtract the positive
    mod first so the quotient is an integer (divisor must be > 0)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def _quant(frac: Column, qbits: int) -> Column:
    return F.floor(frac * F.lit(float(1 << qbits))).cast("long")


def supercover(
    segs: DataFrame,
    z: int = 8,
    qbits: int = 16,
    id_col: str = "seg_id",
) -> DataFrame:
    """(seg_id, lon1, lat1, lon2, lat2) -> (seg_id, tile_x, tile_y):
    every z-tile the fixed-point segment passes through, DISTINCT."""
    Q = 1 << qbits
    d = segs.select(
        F.col(id_col),
        _quant(tiles.fraction_x("lon1", z), qbits).alias("x1"),
        _quant(tiles.fraction_y("lat1", z), qbits).alias("y1"),
        _quant(tiles.fraction_x("lon2", z), qbits).alias("x2"),
        _quant(tiles.fraction_y("lat2", z), qbits).alias("y2"),
    )

    def crossings(a_main, a_other, b_main, b_other, flip: bool):
        """Cells around every integer gridline of the main axis; the
        endpoints are ordered so b_main >= a_main."""
        lo_m = F.least(a_main, b_main)
        lo_o = F.when(a_main <= b_main, a_other).otherwise(b_other)
        hi_m = F.greatest(a_main, b_main)
        hi_o = F.when(a_main <= b_main, b_other).otherwise(a_other)
        g1 = F.shiftright(lo_m, qbits) + 1
        g2 = F.shiftright(hi_m, qbits)
        def cell(g):
            gv = g.cast("long") * F.lit(Q)
            o = lo_o + _fld((gv - lo_m) * (hi_o - lo_o), hi_m - lo_m)
            oc = F.shiftright(o, qbits)
            a = F.struct((g - 1).cast("long").alias("m"), oc.alias("o"))
            b = F.struct(g.cast("long").alias("m"), oc.alias("o"))
            return F.array(a, b)
        pairs = F.when(
            (hi_m > lo_m) & (g2 >= g1),
            F.flatten(F.transform(F.sequence(g1, g2), cell)),
        ).otherwise(F.array().cast("array<struct<m:bigint,o:bigint>>"))
        if flip:
            return F.transform(
                pairs,
                lambda s: F.struct(s["o"].alias("x"), s["m"].alias("y")),
            )
        return F.transform(
            pairs, lambda s: F.struct(s["m"].alias("x"), s["o"].alias("y"))
        )

    ends = F.array(
        F.struct(
            F.shiftright("x1", qbits).alias("x"),
            F.shiftright("y1", qbits).alias("y"),
        ),
        F.struct(
            F.shiftright("x2", qbits).alias("x"),
            F.shiftright("y2", qbits).alias("y"),
        ),
    )
    allcells = F.concat(
        ends,
        crossings(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"), False),
        crossings(F.col("y1"), F.col("x1"), F.col("y2"), F.col("x2"), True),
    )
    return (
        d.select(id_col, F.explode(allcells).alias("c"))
        .select(
            id_col,
            F.col("c.x").alias("tile_x"),
            F.col("c.y").alias("tile_y"),
        )
        .distinct()
    )
