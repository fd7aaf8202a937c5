"""Segment↔bbox clipping (Liang-Barsky) in exact int64 arithmetic.

Reproduces the orb/clip semantics the reference's render consumers use
(public orb API: ``clip.LineString(bound, ls)`` — Cohen-Sutherland /
Liang-Barsky family; the reference itself exposes the bbox type those
clips take at bounds.go:10-34): every way segment is kept, clipped, or
dropped against a viewport rectangle.

Exactness contract (same fixed-point discipline as
``geo/raster_line.py``): inputs are e6-quantized int64 lon/lat, so
every crossing parameter t is a RATIONAL with a positive denominator
|d| ≤ 7.2e8.  All comparisons cross-multiply (products ≤ 5.2e17, inside
int64), and clipped vertices land back on the e6 grid via exact FLOOR
division — expressed as ``(a - ((a % b + b) % b)) / b`` in BOTH engines
(truncating ``%`` makes the numerator exactly divisible, so truncating
integer division equals floor; DuckDB's ``//`` and Spark's ``DIV`` both
truncate, and the intermediate never routes through a double, which
would lose exactness past 2^53).

Plan shape: pure column math over a segments frame — no UDF, no join,
no shuffle; at 10^12 rows the clip is a map-side project fused into
whatever scan produced the segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _steps(bx0: int, bx1: int, by0: int, by1: int, fdiv) -> list[dict[str, str]]:
    """The shared Liang-Barsky dataflow as per-step named expressions.

    Each step is a dict of new-column -> SQL expression over previous
    columns.  Integer-exact, so Spark and DuckDB evaluate it
    identically; ``fdiv(a, b)`` renders the engine's floor division
    (b > 0 always).
    """
    return [
        # deltas + endpoint-inside flags
        {
            "dx": "x2 - x1",
            "dy": "y2 - y1",
            "in1": f"(x1 >= {bx0} AND x1 <= {bx1} AND y1 >= {by0} AND y1 <= {by1})",
            "in2": f"(x2 >= {bx0} AND x2 <= {bx1} AND y2 >= {by0} AND y2 <= {by1})",
        },
        # per-axis enter/exit crossing fractions, denominators > 0.
        # dx = 0: no x-constraint (enter 0/1, exit 1/1) unless the
        # segment is wholly outside that slab -> axis_reject.
        {
            "ex_num": f"CASE WHEN dx > 0 THEN {bx0} - x1 "
                      f"WHEN dx < 0 THEN x1 - {bx1} ELSE 0 END",
            "xx_num": f"CASE WHEN dx > 0 THEN {bx1} - x1 "
                      f"WHEN dx < 0 THEN x1 - {bx0} ELSE 1 END",
            "x_den": "CASE WHEN dx = 0 THEN 1 ELSE abs(dx) END",
            "x_rej": f"(dx = 0 AND (x1 < {bx0} OR x1 > {bx1}))",
            "ey_num": f"CASE WHEN dy > 0 THEN {by0} - y1 "
                      f"WHEN dy < 0 THEN y1 - {by1} ELSE 0 END",
            "xy_num": f"CASE WHEN dy > 0 THEN {by1} - y1 "
                      f"WHEN dy < 0 THEN y1 - {by0} ELSE 1 END",
            "y_den": "CASE WHEN dy = 0 THEN 1 ELSE abs(dy) END",
            "y_rej": f"(dy = 0 AND (y1 < {by0} OR y1 > {by1}))",
        },
        # t_enter = max(0, ex, ey), t_exit = min(1, xx, xy) as exact
        # fractions (cross-multiplied picks; ties resolve to either
        # representation of the same rational, so floors agree)
        {
            "te_num": "CASE WHEN ex_num <= 0 AND ey_num <= 0 THEN 0 "
                      "WHEN ex_num * y_den >= ey_num * x_den THEN ex_num "
                      "ELSE ey_num END",
            "te_den": "CASE WHEN ex_num <= 0 AND ey_num <= 0 THEN 1 "
                      "WHEN ex_num * y_den >= ey_num * x_den THEN x_den "
                      "ELSE y_den END",
            "tx_num": "CASE WHEN xx_num >= x_den AND xy_num >= y_den THEN 1 "
                      "WHEN xx_num * y_den <= xy_num * x_den THEN xx_num "
                      "ELSE xy_num END",
            "tx_den": "CASE WHEN xx_num >= x_den AND xy_num >= y_den THEN 1 "
                      "WHEN xx_num * y_den <= xy_num * x_den THEN x_den "
                      "ELSE y_den END",
        },
        # accept test + clipped vertices (exact floor back to the grid)
        {
            "ok": "(NOT x_rej AND NOT y_rej "
                  "AND te_num * tx_den <= tx_num * te_den)",
            "cxa": f"x1 + {fdiv('te_num * dx', 'te_den')}",
            "cya": f"y1 + {fdiv('te_num * dy', 'te_den')}",
            "cxb": f"x1 + {fdiv('tx_num * dx', 'tx_den')}",
            "cyb": f"y1 + {fdiv('tx_num * dy', 'tx_den')}",
        },
        {
            "status": "CASE WHEN NOT ok THEN 'outside' "
                      "WHEN in1 AND in2 THEN 'inside' "
                      "ELSE 'clipped' END",
        },
    ]


def _fdiv_spark(a: str, b: str) -> str:
    return f"(({a}) - pmod({a}, {b})) DIV ({b})"


def _fdiv_duck(a: str, b: str) -> str:
    return f"(({a}) - ((({a}) % ({b}) + ({b})) % ({b}))) // ({b})"


def clip_to_bbox(
    segs: DataFrame, bx0: int, bx1: int, by0: int, by1: int
) -> DataFrame:
    """Clip a segments frame (cols ``x1 y1 x2 y2`` int64 e6 + any id
    cols) to the bbox; adds ``status`` ('inside'|'clipped'|'outside')
    and clipped e6 endpoints ``cxa cya cxb cyb`` (null when outside)."""
    df = segs
    for step in _steps(bx0, bx1, by0, by1, _fdiv_spark):
        df = df.select("*", *[F.expr(e).alias(c) for c, e in step.items()])
    keep = [c for c in segs.columns]
    return df.select(
        *keep,
        "status",
        *[
            F.when(F.col("ok"), F.col(c)).alias(c)
            for c in ("cxa", "cya", "cxb", "cyb")
        ],
    )


def clip_sql(
    source_cte: str, id_cols: list[str], bx0: int, bx1: int, by0: int, by1: int
) -> str:
    """DuckDB twin: WITH-chain over ``source_cte`` (same columns),
    ending in a SELECT of id cols + status + clipped endpoints."""
    ids = ", ".join(id_cols)
    prev = source_cte
    ctes = []
    for i, step in enumerate(_steps(bx0, bx1, by0, by1, _fdiv_duck)):
        cols = ", ".join(f"{e} AS {c}" for c, e in step.items())
        name = f"cl{i}"
        ctes.append(f"{name} AS (SELECT *, {cols} FROM {prev})")
        prev = name
    chain = ",\n    ".join(ctes)
    return f"""{chain}
    SELECT {ids}, status,
           CASE WHEN ok THEN cxa END AS cxa,
           CASE WHEN ok THEN cya END AS cya,
           CASE WHEN ok THEN cxb END AS cxb,
           CASE WHEN ok THEN cyb END AS cyb
    FROM {prev}"""
