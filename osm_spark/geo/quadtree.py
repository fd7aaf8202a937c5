"""Adaptive quadtree binning — equi-depth spatial partitioning.

Fixed-zoom tiles are the wrong partition grain for skewed data: at
10^12 geocoded pages one hot-city tile holds 10^9 rows while ocean
tiles hold none.  The adaptive quadtree splits exactly where the
data is dense — cells over a row cap recurse into their four
children, everything else stays coarse — producing the leaf set a
skew-aware `repartitionByRange`/bucketing layout actually wants
(each leaf ~<= cap rows, leaf count ~ corpus/cap regardless of how
pathological the hot spots are).  This is the planning complement of
tile_skew_profile (which DIAGNOSES hot keys; this emits the balanced
layout) and the Z-order table's natural partner (leaves are quadkey
prefixes).

Scale shape — NO iterative rescans of the point set:

- ONE point-level aggregation at z_max builds the finest counts;
  every coarser level is a parent-sum roll-up of the level below
  (cell-sized frames, 4-to-1 shrink per level — the tile_pyramid
  kernel).
- The split/leaf decision walks DOWN through cell-sized joins: a
  level-z cell is ELIGIBLE iff its parent split (eligible AND over
  cap); eligible cells at or under cap — or at z_max — are leaves.
  Every join is cell-keyed and map-side-combinable; points are never
  touched again.
- Leaf-set invariant (pytest + oracle-pinned): leaves tile the
  occupied space exactly — every point lies in exactly one leaf, so
  sum(leaf n) == |points|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adaptive_bins(
    pts: DataFrame,
    z_min: int,
    z_max: int,
    cap: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """-> (z, x, y, n) quadtree leaves.

    ``pts`` carries z_max tile coords (x_col, y_col); a leaf is an
    occupied cell whose ancestors (down to z_min) all exceeded
    ``cap`` and which itself is at or under cap — or at z_max, where
    recursion stops regardless."""
    counts = {
        z_max: pts.groupBy(
            F.col(x_col).alias("x"), F.col(y_col).alias("y")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    }
    for z in range(z_max - 1, z_min - 1, -1):
        counts[z] = (
            counts[z + 1]
            .groupBy(
                F.shiftright("x", 1).alias("x"),
                F.shiftright("y", 1).alias("y"),
            )
            .agg(F.sum("n").cast("long").alias("n"))
        )

    leaves = None
    elig = counts[z_min]
    for z in range(z_min, z_max + 1):
        is_leaf = (F.col("n") <= cap) | F.lit(z == z_max)
        leaf_z = elig.where(is_leaf).select(
            F.lit(z).cast("long").alias("z"), "x", "y", "n"
        )
        leaves = leaf_z if leaves is None else leaves.unionByName(leaf_z)
        if z < z_max:
            split = elig.where(F.col("n") > cap).select(
                F.col("x").alias("px"), F.col("y").alias("py")
            )
            nxt = counts[z + 1]
            elig = nxt.join(
                split,
                (F.shiftright(nxt["x"], 1) == F.col("px"))
                & (F.shiftright(nxt["y"], 1) == F.col("py")),
                "semi",
            )
    return leaves


def adaptive_bins_sql(
    pts_cte: str, z_min: int, z_max: int, cap: int
) -> tuple[str, str]:
    """DuckDB twin over ``pts_cte`` (x, y at z_max).  Returns
    (extra_ctes, final_select) producing (z, x, y, n)."""
    parts = [
        f"c{z_max} AS (SELECT x, y, count(*) AS n FROM {pts_cte} "
        f"GROUP BY x, y)"
    ]
    for z in range(z_max - 1, z_min - 1, -1):
        parts.append(
            f"c{z} AS (SELECT x // 2 AS x, y // 2 AS y, sum(n) AS n "
            f"FROM c{z + 1} GROUP BY x // 2, y // 2)"
        )
    parts.append(f"e{z_min} AS (SELECT * FROM c{z_min})")
    sel = []
    for z in range(z_min, z_max + 1):
        leaf_cond = f"n <= {cap}" if z < z_max else "TRUE"
        sel.append(
            f"SELECT CAST({z} AS BIGINT) AS z, x, y, "
            f"CAST(n AS BIGINT) AS n FROM e{z} WHERE {leaf_cond}"
        )
        if z < z_max:
            parts.append(
                f"e{z + 1} AS (SELECT c.x, c.y, c.n FROM c{z + 1} c "
                f"JOIN (SELECT x, y FROM e{z} WHERE n > {cap}) p "
                f"ON c.x // 2 = p.x AND c.y // 2 = p.y)"
            )
    final = "\n    UNION ALL ".join(sel)
    return ",\n    ".join(parts), final
