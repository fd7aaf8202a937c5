"""Segment-intersection spatial join: which ways cross each other.

The classic OSM QA query over the reference's data model — two way
geometries that properly cross without sharing a node (a road crossing
a river with no bridge node is a map error).  The reference gives the
ingredients (way geometries via WayNodes, `orb`-style planar predicates
used by its consumers); this module supplies the JOIN the reference
never had to scale: all-pairs segment intersection over a planet of
ways.

Spark-first shape (same discipline as geo/distance_join.py and
geo/snap.py — never all-pairs):

- Segments arrive as int64 fixed-point endpoints (µdeg or any uniform
  quantization) so every predicate below is EXACT integer arithmetic —
  Spark and the SQL oracle agree bit-for-bit with no float epsilon.
- Each segment explodes to the grid cells its BOUNDING BOX covers
  (cell = coordinate >> cell_bits).  Two segments can only intersect
  inside a cell both touch, so candidates are an equi-join on cell —
  |pairs| is cell-local, never |segs|².
- The exact test is the orientation (ccw) sign test: AB properly
  crosses CD iff C and D lie strictly on opposite sides of AB AND A, B
  strictly on opposite sides of CD.  Signs are compared as booleans
  (``d1 > 0 XOR d2 > 0`` with both nonzero) — the cross products fit
  int64 but their PRODUCT would not, so no ``d1*d2 < 0``.
- A pair sharing several cells is tested once per shared cell and
  deduplicated by the final DISTINCT on (seg_a, seg_b) — the only
  pair-keyed exchange, sized by the OUTPUT (actual crossings), not the
  candidate set.

Proper crossing only: collinear overlaps and T-touches (an endpoint
exactly on the other segment) are excluded — shared junction nodes are
how ways legally meet, so the QA signal is strict interior crossing.

At 10^12 segments: the explode factor is the per-segment cell-bbox
area (pick ``cell_bits`` near the median segment extent so it stays
1-4); hot cells (cities) are AQE skew-join territory, same as the
distance join.  No Python anywhere — whole-stage codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(lo: Column, hi: Column, bits: int) -> Column:
    """Inclusive cell index sequence covering [lo, hi] (lo <= hi)."""
    return F.sequence(F.shiftright(lo, bits), F.shiftright(hi, bits))


def _opposite(d1: Column, d2: Column) -> Column:
    """Strictly opposite signs, overflow-free (no d1*d2)."""
    return ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))


def _cross(ox, oy, ax, ay, bx, by) -> Column:
    """z of (a-o) x (b-o); int64-exact for quantized coordinates."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def segment_crossings(
    segs: DataFrame,
    cell_bits: int = 20,
    id_col: str = "seg_id",
) -> DataFrame:
    """(seg_id, x1, y1, x2, y2 int64) -> (seg_a, seg_b): every pair of
    distinct segments that properly cross, each pair once
    (seg_a < seg_b).  Coordinates must be int64 fixed-point; with
    µdeg inputs the default 2^20 cell is ~1.05°."""
    s = segs.select(
        F.col(id_col).alias("sid"),
        "x1", "y1", "x2", "y2",
        F.least("x1", "x2").alias("xlo"),
        F.greatest("x1", "x2").alias("xhi"),
        F.least("y1", "y2").alias("ylo"),
        F.greatest("y1", "y2").alias("yhi"),
    )
    cells = s.select(
        "*",
        F.explode(_cells(F.col("xlo"), F.col("xhi"), cell_bits)).alias("cx"),
    ).select(
        "*",
        F.explode(_cells(F.col("ylo"), F.col("yhi"), cell_bits)).alias("cy"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    A, B = (lambda c: F.col(f"a.{c}")), (lambda c: F.col(f"b.{c}"))
    cand = a.join(
        b,
        (A("cx") == B("cx")) & (A("cy") == B("cy"))
        & (A("sid") < B("sid"))
        # bbox overlap prunes most cell-mates before the cross products
        & (A("xlo") <= B("xhi")) & (B("xlo") <= A("xhi"))
        & (A("ylo") <= B("yhi")) & (B("ylo") <= A("yhi")),
    )
    d1 = _cross(A("x1"), A("y1"), A("x2"), A("y2"), B("x1"), B("y1"))
    d2 = _cross(A("x1"), A("y1"), A("x2"), A("y2"), B("x2"), B("y2"))
    d3 = _cross(B("x1"), B("y1"), B("x2"), B("y2"), A("x1"), A("y1"))
    d4 = _cross(B("x1"), B("y1"), B("x2"), B("y2"), A("x2"), A("y2"))
    return (
        cand.where(_opposite(d1, d2) & _opposite(d3, d4))
        .select(A("sid").alias("seg_a"), B("sid").alias("seg_b"))
        .distinct()
    )
