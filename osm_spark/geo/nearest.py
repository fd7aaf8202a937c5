"""Nearest-site assignment (discrete Voronoi labelling) — shuffle-free.

Assign every point to the nearest of K sites (facilities, datacenter
regions, canonical city centroids).  K is parameter-sized (tens to a
few thousand) while the point side is the 10^12-row table, so the
correct 100 TB shape is the same as the engine's broadcast PIP join:
ship the sites to every task and evaluate in-row — **zero joins, zero
shuffles**; the whole operator is a scan-side projection that
whole-stage codegen fuses into the reading stage.

Distance is exact-integer planar squared distance on µdeg coordinates
(dx*dx + dy*dy as int64 — |d| <= 3.6e8 µdeg per axis, so each square
<= 1.3e17 and the sum < 2^63; no floats anywhere, so Spark and any
oracle agree bit-for-bit, and ties break deterministically on the
smaller site id).  For geodesic semantics feed the same argmin with
haversine terms instead — the plan shape is identical; the engine
keeps the integer kernel as the cross-engine-exact default (equirect
distortion does not change the ARGMIN for separated site sets; callers
with antimeridian-straddling data should normalize dx = min(dx,
360e6 - dx) scan-side first).

The argmin is one ``F.aggregate`` fold over an array-of-struct literal
— in-row, branch-free, no explode (an explode + min(struct) groupBy
would shuffle |points| * K rows for nothing).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conservative per-axis bound keeping dx*dx + dy*dy inside int64
MAX_ABS_UDEG = 1_500_000_000


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def sites_array(sites: Sequence[tuple[int, int, int]]) -> Column:
    """Literal array<struct<sid,sx,sy>> from [(site_id, x_udeg, y_udeg)].

    Raises if any coordinate could overflow the int64 squared-distance
    bound — load-bearing, so a ValueError, not an assert.
    """
    if not sites:
        raise ValueError("nearest_site needs at least one site")
    for sid, sx, sy in sites:
        if abs(int(sx)) > MAX_ABS_UDEG or abs(int(sy)) > MAX_ABS_UDEG:
            raise ValueError(
                f"site {sid} coordinate exceeds +-{MAX_ABS_UDEG} udeg; "
                "squared distance would overflow int64"
            )
    return F.array(
        *[
            F.struct(
                F.lit(int(sid)).cast("long").alias("sid"),
                F.lit(int(sx)).cast("long").alias("sx"),
                F.lit(int(sy)).cast("long").alias("sy"),
            )
            for sid, sx, sy in sites
        ]
    )


def nearest_site(
    points: DataFrame,
    sites: Sequence[tuple[int, int, int]],
    x_col: str | Column = "px",
    y_col: str | Column = "py",
    out_site: str = "site_id",
    out_d2: str = "d2",
) -> DataFrame:
    """points + (site_id, d2) of the nearest site — in-row argmin.

    ``points`` must carry integer µdeg coordinates in ``x_col`` /
    ``y_col`` (|value| <= 1.5e9 guards the int64 bound; violating rows
    would overflow silently, so callers quantize first — the engine's
    fixtures always do).  Ties break on the smaller site id, making
    the labelling a total function of the inputs.
    """
    arr = sites_array(sites)
    px, py = _c(x_col), _c(y_col)

    def _merge(acc: Column, s: Column) -> Column:
        d2 = (s["sx"] - px) * (s["sx"] - px) + (s["sy"] - py) * (s["sy"] - py)
        better = (
            acc["d2"].isNull()
            | (d2 < acc["d2"])
            | ((d2 == acc["d2"]) & (s["sid"] < acc["sid"]))
        )
        cand = F.struct(s["sid"].alias("sid"), d2.alias("d2"))
        return F.when(better, cand).otherwise(acc)

    best = F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("long").alias("sid"),
            F.lit(None).cast("long").alias("d2"),
        ),
        _merge,
    )
    return (
        points.withColumn("_ns", best)
        .withColumn(out_site, F.col("_ns.sid"))
        .withColumn(out_d2, F.col("_ns.d2"))
        .drop("_ns")
    )
