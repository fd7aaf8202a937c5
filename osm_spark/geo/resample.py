"""Even-spacing linestring resampling (orb/resample semantics).

``Resample(ls, n)`` of the public orb API: n points evenly spaced by
ARC LENGTH along the line — target distance d_j = j·L/(n−1), walk the
segments' cumulative chord lengths, interpolate linearly inside the
segment that contains d_j.

Float-parity discipline (same as geo/tiles.py): chord lengths need a
sqrt, so this operator has a genuine double surface — the Spark
expressions and the DuckDB twin are kept OPERATION-IDENTICAL
(sqrt/±/×/÷ are IEEE-correctly-rounded, running window sums both fold
left-to-right in frame order), and outputs quantize ONCE to the e6
grid with floor.  Segment pick is a half-open interval
``cum_start ≤ d < cum_start+len`` — zero-length segments own an empty
interval and can never be picked — with the j = n−1 endpoint emitted
explicitly (d = L matches no half-open interval).

Plan shape: one window pass builds cumulative lengths, targets explode
from a literal sequence, and the pick is an equi-join on way_id with a
range filter — per-way row counts are way-bounded, so at 10^12 rows
the join stays narrow per key with no skew surface beyond way length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(ways_pts: DataFrame, n: int) -> DataFrame:
    """``ways_pts``: (way_id, pos, x, y) e6 int64 vertices, pos dense
    0-based.  Returns (way_id, j, rx, ry): n evenly-spaced points per
    way, e6-floored.  Ways whose total length is 0 emit only j = n−1
    (documented degenerate case, mirrored by the SQL twin)."""
    w = Window.partitionBy("way_id").orderBy("pos")
    segs = ways_pts.select(
        "way_id",
        "pos",
        "x",
        "y",
        F.lead("x").over(w).alias("x2"),
        F.lead("y").over(w).alias("y2"),
    ).where(F.col("x2").isNotNull())
    segs = segs.select(
        "*",
        F.sqrt(
            (
                (F.col("x2") - F.col("x")) * (F.col("x2") - F.col("x"))
                + (F.col("y2") - F.col("y")) * (F.col("y2") - F.col("y"))
            ).cast("double")
        ).alias("len"),
    )
    cum = Window.partitionBy("way_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = Window.partitionBy("way_id")
    segs = segs.select(
        "*",
        F.coalesce(F.sum("len").over(cum), F.lit(0.0)).alias("cum_start"),
        F.sum("len").over(tot).alias("total"),
    )

    targets = (
        segs.groupBy("way_id")
        .agg(
            F.max("total").alias("total"),
            F.max(F.struct("pos", "x2", "y2")).alias("last"),
        )
        .select(
            "way_id",
            "total",
            F.col("last.x2").alias("ex"),
            F.col("last.y2").alias("ey"),
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("j"),
        )
        .select(
            "*",
            (
                F.col("j").cast("double")
                * F.col("total")
                / F.lit(float(n - 1))
            ).alias("d"),
        )
    )

    interior = (
        targets.where(F.col("j") < n - 1)
        .join(segs, "way_id")
        .where(
            (F.col("d") >= F.col("cum_start"))
            & (F.col("d") < F.col("cum_start") + F.col("len"))
        )
        .select(
            "way_id",
            "j",
            F.floor(
                F.col("x").cast("double")
                + (F.col("d") - F.col("cum_start"))
                / F.col("len")
                * (F.col("x2") - F.col("x")).cast("double")
            ).cast("long").alias("rx"),
            F.floor(
                F.col("y").cast("double")
                + (F.col("d") - F.col("cum_start"))
                / F.col("len")
                * (F.col("y2") - F.col("y")).cast("double")
            ).cast("long").alias("ry"),
        )
    )
    endpoint = targets.where(F.col("j") == n - 1).select(
        "way_id", "j", F.col("ex").alias("rx"), F.col("ey").alias("ry")
    )
    return interior.unionByName(endpoint)


def resample_sql(points_cte: str, n: int) -> str:
    """DuckDB twin over ``{points_cte}`` (way_id, pos, x, y) —
    operation-identical float expressions (see module docstring)."""
    return f"""segs AS (
      SELECT way_id, pos, x, y,
             lead(x) OVER w AS x2, lead(y) OVER w AS y2
      FROM {points_cte}
      WINDOW w AS (PARTITION BY way_id ORDER BY pos)),
    segs2 AS (
      SELECT *, sqrt(CAST((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)
                          AS DOUBLE)) AS len
      FROM segs WHERE x2 IS NOT NULL),
    segs3 AS (
      SELECT *,
             coalesce(sum(len) OVER (PARTITION BY way_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0.0) AS cum_start,
             sum(len) OVER (PARTITION BY way_id) AS total
      FROM segs2),
    ends AS (
      SELECT way_id, max(total) AS total,
             max(struct_pack(pos := pos, x2 := x2, y2 := y2)) AS last
      FROM segs3 GROUP BY way_id),
    targets AS (
      SELECT way_id, total, last.x2 AS ex, last.y2 AS ey, u.j,
             CAST(u.j AS DOUBLE) * total / {float(n - 1)!r} AS d
      FROM ends, UNNEST(range(0, {n})) AS u(j)),
    interior AS (
      SELECT t.way_id, t.j,
             CAST(floor(CAST(s.x AS DOUBLE)
                  + (t.d - s.cum_start) / s.len
                    * CAST(s.x2 - s.x AS DOUBLE)) AS BIGINT) AS rx,
             CAST(floor(CAST(s.y AS DOUBLE)
                  + (t.d - s.cum_start) / s.len
                    * CAST(s.y2 - s.y AS DOUBLE)) AS BIGINT) AS ry
      FROM targets t JOIN segs3 s ON s.way_id = t.way_id
      WHERE t.j < {n - 1}
        AND t.d >= s.cum_start AND t.d < s.cum_start + s.len)
    SELECT way_id, CAST(j AS BIGINT) AS j, rx, ry FROM interior
    UNION ALL
    SELECT way_id, CAST(j AS BIGINT), ex, ey FROM targets
    WHERE j = {n - 1}"""
