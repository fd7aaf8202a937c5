"""Douglas-Peucker line simplification as a DataFrame frontier recursion.

Reproduces orb/simplify's ``DouglasPeucker(threshold)`` semantics (the
public orb API the reference's geometry consumers use; reference
exposes the line geometries it applies to at way.go:31-54): keep both
endpoints, find the interior vertex farthest from the chord, split
there if it exceeds the threshold, recurse, else drop the interior.

Exactness contract (same fixed-point discipline as geo/clip.py and
geo/raster_line.py): e6 int64 vertices, so the perpendicular-distance
comparison is exact:

- WITHIN a range the chord is constant, so the argmax vertex is the
  argmax of |cross| = |(bx-ax)(py-ay) - (by-ay)(px-ax)| — plain int64
  (≤ 2.4e17), ties break to the LOWEST index (mirrored in both
  engines).
- The threshold test dist > eps ⟺ cross² > eps²·len² needs one wide
  multiply: Spark does it in DECIMAL(38,0) (cross ≤ 2.4e17 squares to
  < 1e38, exact), DuckDB in HUGEINT — both exact integers, no float
  surface anywhere.

Plan shape: the recursion is DATA-PARALLEL over ranges — every
iteration is narrow column math (transform/filter/array_max over
way-bounded slices) plus one explode; no shuffle until the final
DISTINCT on kept vertices.  Each range row carries only ITS slice of
the way (split at the split point), so total bytes are O(n log n) per
way, not O(n·ranges).  Frontiers localCheckpoint every few levels —
the measured plan-nesting failure mode of iterative loops
(plans/iterate.py).  Worst-case depth is O(n) only for adversarial
monotone-distance chains; real geometry converges in O(log n) levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(19,0)"


def _iterate(frontier: DataFrame, eps_e6: int):
    """One DP level: returns (terminal_keeps, child_frontier)."""
    n = F.col("n")
    a = F.col("a")
    b = F.col("b")

    fr = frontier.select(
        "way_id",
        "off",
        "pts",
        F.size("pts").alias("n"),
    ).select(
        "*",
        F.element_at("pts", 1).alias("a"),
        F.element_at("pts", n).alias("b"),
    )

    def cross(p):
        return (b["x"] - a["x"]) * (p["y"] - a["y"]) - (b["y"] - a["y"]) * (
            p["x"] - a["x"]
        )

    cand = F.filter(
        F.transform(
            "pts",
            lambda p, i: F.struct(
                F.abs(cross(p)).alias("ac"), (-i).alias("ni"), i.alias("idx")
            ),
        ),
        lambda s: (s["idx"] > 0) & (s["idx"] < n - 1),
    )
    fr = fr.select("*", F.array_max(cand).alias("best"))
    len2 = (b["x"] - a["x"]) * (b["x"] - a["x"]) + (b["y"] - a["y"]) * (
        b["y"] - a["y"]
    )
    ac = F.col("best")["ac"]
    over = (
        ac.cast(_DEC) * ac.cast(_DEC)
        > F.lit(eps_e6 * eps_e6).cast(_DEC) * len2.cast(_DEC)
    )
    fr = fr.select(
        "*", (F.col("best").isNotNull() & over).alias("split")
    )

    terminal = fr.where(~F.col("split")).select(
        "way_id",
        F.explode(
            F.array(
                F.struct(F.col("off").alias("pos"), a["x"].alias("x"), a["y"].alias("y")),
                F.struct(
                    (F.col("off") + n - 1).alias("pos"),
                    b["x"].alias("x"),
                    b["y"].alias("y"),
                ),
            )
        ).alias("k"),
    ).select("way_id", F.col("k.pos").alias("pos"), F.col("k.x").alias("x"), F.col("k.y").alias("y"))

    j = F.col("best")["idx"]
    children = fr.where(F.col("split")).select(
        "way_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("off").alias("off"),
                    F.slice("pts", 1, j + 1).alias("pts"),
                ),
                F.struct(
                    (F.col("off") + j).alias("off"),
                    F.slice("pts", j + 1, n - j).alias("pts"),
                ),
            )
        ).alias("c"),
    ).select("way_id", F.col("c.off").alias("off"), F.col("c.pts").alias("pts"))

    return terminal, children


def simplify_dp(
    ways: DataFrame,
    eps_e6: int,
    max_iter: int = 64,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``ways``: (way_id, pts array<struct<x:long,y:long>> in vertex
    order).  Returns kept vertices (way_id, pos, x, y), pos = original
    0-based index — exactly orb/simplify's retained-vertex set."""
    frontier = ways.select("way_id", F.lit(0).alias("off"), F.col("pts"))
    kept: DataFrame | None = None
    for it in range(max_iter):
        terminal, frontier = _iterate(frontier, eps_e6)
        kept = terminal if kept is None else kept.unionByName(terminal)
        if it % checkpoint_every == checkpoint_every - 1:
            frontier = frontier.localCheckpoint(eager=True)
            kept = kept.localCheckpoint(eager=True)
            if frontier.isEmpty():
                break
    else:
        if not frontier.isEmpty():
            raise RuntimeError(
                f"simplify_dp frontier not drained after {max_iter} levels"
            )
    return kept.distinct()


def simplify_dp_kernel(points: DataFrame, eps_e6: int) -> DataFrame:
    """Arrow-kernel DP — the SCALE path (what ``simplify_dp`` the query
    runs): one shuffle by way_id, one ``applyInPandas`` stage, done.

    Why not the column frontier at scale: the frontier loop's iteration
    count is the MAX recursion depth over ALL ways, and every level is
    a driver-synchronized round (plus a codegen compile of the level's
    plan) — a global barrier per level across the whole cluster.  DP
    is embarrassingly parallel PER WAY, so the per-way kernel is one
    stage with no cross-way coordination; measured 77s → <1s at sf0.1.
    Same class of designated Arrow boundary as the annotate kernel
    (temporal/annotate.py).

    Exactness: argmax |cross| in numpy int64 (products ≤ 1.3e17 for
    world-span e6 inputs), the lone threshold square in Python bigints
    — bit-identical to the frontier version and the DuckDB twin
    (asserted in tests/test_simplify.py).

    ``points``: (way_id, pos, x, y) — pos dense 0-based per way.
    """
    import numpy as np
    import pandas as pd

    eps2 = int(eps_e6) * int(eps_e6)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out_w, out_p, out_x, out_y = [], [], [], []
        for wid, grp in pdf.groupby("way_id"):
            grp = grp.sort_values("pos")
            xs = grp["x"].to_numpy(np.int64)
            ys = grp["y"].to_numpy(np.int64)
            n = len(xs)
            keep = np.zeros(n, dtype=bool)
            keep[0] = keep[n - 1] = True
            stack = [(0, n - 1)]
            while stack:
                i0, i1 = stack.pop()
                if i1 - i0 < 2:
                    continue
                dx = int(xs[i1] - xs[i0])
                dy = int(ys[i1] - ys[i0])
                cross = np.abs(
                    dx * (ys[i0 + 1 : i1] - ys[i0])
                    - dy * (xs[i0 + 1 : i1] - xs[i0])
                )
                j_rel = int(np.argmax(cross))  # first max = lowest idx
                c = int(cross[j_rel])
                if c * c > eps2 * (dx * dx + dy * dy):
                    j = i0 + 1 + j_rel
                    keep[j] = True
                    stack.append((i0, j))
                    stack.append((j, i1))
            idx = np.flatnonzero(keep)
            out_w.extend([wid] * len(idx))
            out_p.extend(idx.tolist())
            out_x.extend(xs[idx].tolist())
            out_y.extend(ys[idx].tolist())
        return pd.DataFrame(
            {"way_id": out_w, "pos": out_p, "x": out_x, "y": out_y}
        )

    return points.groupBy("way_id").applyInPandas(
        fn, "way_id long, pos long, x long, y long"
    )


# ================================================================ SQL twin

def simplify_sql(points_cte: str, eps_e6: int) -> str:
    """DuckDB twin as a recursive CTE chain over ``points_cte``
    (way_id, idx, x, y; idx 0-based dense per way).  Emits the CTE text
    from ``rng`` onward — embed inside a ``WITH RECURSIVE ... `` that
    already defined ``{points_cte}``.  The recursive step picks each
    range's argmax-|cross| interior vertex with a NOT EXISTS
    (aggregate-free, as required inside a recursive term), ties to the
    lowest index, and splits only past the HUGEINT-exact threshold."""

    def cr(px: str, py: str) -> str:
        return (
            f"abs((b.x - a.x) * ({py} - a.y) - (b.y - a.y) * ({px} - a.x))"
        )

    crj = cr("j.x", "j.y")
    crq = cr("q.x", "q.y")
    return f"""rng AS (
      SELECT way_id, 0 AS i0, max(idx) AS i1 FROM {points_cte} GROUP BY way_id
      UNION ALL
      SELECT r.way_id,
             CASE WHEN s.side = 0 THEN r.i0 ELSE j.idx END AS i0,
             CASE WHEN s.side = 0 THEN j.idx ELSE r.i1 END AS i1
      FROM rng r
      JOIN {points_cte} a ON a.way_id = r.way_id AND a.idx = r.i0
      JOIN {points_cte} b ON b.way_id = r.way_id AND b.idx = r.i1
      JOIN {points_cte} j ON j.way_id = r.way_id
           AND j.idx > r.i0 AND j.idx < r.i1
           AND NOT EXISTS (
             SELECT 1 FROM {points_cte} q
             WHERE q.way_id = r.way_id AND q.idx > r.i0 AND q.idx < r.i1
               AND ({crq} > {crj} OR ({crq} = {crj} AND q.idx < j.idx)))
      CROSS JOIN (SELECT 0 AS side UNION ALL SELECT 1) s
      WHERE r.i1 > r.i0 + 1
        AND CAST({crj} AS HUGEINT) * CAST({crj} AS HUGEINT)
            > {eps_e6 * eps_e6} * CAST((b.x - a.x) * (b.x - a.x)
                                     + (b.y - a.y) * (b.y - a.y) AS HUGEINT)
    ),
    kept AS (
      SELECT DISTINCT way_id, idx FROM (
        SELECT way_id, i0 AS idx FROM rng
        UNION ALL
        SELECT way_id, i1 FROM rng) u
    )
    SELECT k.way_id, CAST(k.idx AS INT) AS pos, p.x, p.y
    FROM kept k JOIN {points_cte} p
      ON p.way_id = k.way_id AND p.idx = k.idx"""
