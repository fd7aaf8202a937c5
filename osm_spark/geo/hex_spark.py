"""Spark column surface for the aperture-7 hex index (geo/hex.py).

All vectorized pandas/Arrow UDFs (north star: "encoded into H3 cells
... via vectorized Arrow UDFs") — each batch is one numpy kernel call,
no per-row Python. The UDFs are the ONLY Python in the plan; joins,
rollups and counts stay JVM-side on the resulting int64 cell columns.

Scale notes: hex_cell is a narrow map (no shuffle); cell ids are
int64 and cluster hierarchically by construction (parent's digit
prefix), so repartitionByRange(cell) co-locates spatially adjacent
data — the same role quadkey_value plays for the Z/X/Y grid.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osm_spark.geo import hex as H


def hex_cell(lat, lon, res: int) -> Column:
    """Column: 64-bit hex cell id at ``res`` from lat/lon columns."""

    @pandas_udf("long")
    def _enc(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        return pd.Series(
            H.latlon_to_cell(lat_s.to_numpy(), lon_s.to_numpy(), res)
        )

    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    return _enc(lat, lon)


def hex_axial(cell) -> Column:
    """Column: unpack a cell id into struct(res, q, r).

    (Constructed lazily — pandas_udf schema parsing needs an active
    SparkSession, so the decorator can't run at module import.)
    """

    @pandas_udf("struct<res:int, q:long, r:long>")
    def _dec(cell_s: pd.Series) -> pd.DataFrame:
        res, q, r = H.cell_to_axial(cell_s.to_numpy())
        return pd.DataFrame({"res": res.astype("int32"), "q": q, "r": r})

    cell = F.col(cell) if isinstance(cell, str) else cell
    return _dec(cell)


def hex_parent(cell, parent_res: int) -> Column:
    """Column: ancestor cell id at ``parent_res`` (digit-chain truncate)."""

    @pandas_udf("long")
    def _par(cell_s: pd.Series) -> pd.Series:
        return pd.Series(H.cell_to_parent(cell_s.to_numpy(), parent_res))

    cell = F.col(cell) if isinstance(cell, str) else cell
    return _par(cell)


def hex_kring(cell, k: int) -> Column:
    """Column: array<long> of the filled k-ring around each cell."""

    @pandas_udf("array<long>")
    def _ring(cell_s: pd.Series) -> pd.Series:
        import numpy as np

        cells = cell_s.to_numpy()
        res, q, r = H.cell_to_axial(cells)
        offs = H.ring_offsets(k)
        outs = []
        # vectorized over rows per offset (|offs| kernel calls, not |rows|)
        ring_ids = np.empty((len(offs), len(cells)), dtype=np.int64)
        for res_v in np.unique(res) if len(cells) else []:
            m = res == res_v
            for i, (dq, dr) in enumerate(offs):
                ring_ids[i, m] = H.axial_to_cell(q[m] + dq, r[m] + dr, int(res_v))
        outs = [ring_ids[:, j].tolist() for j in range(len(cells))]
        return pd.Series(outs)

    cell = F.col(cell) if isinstance(cell, str) else cell
    return _ring(cell)


# ----------------------------------------------------- pure-column twins
# The axial transform is all +,-,*,/ and floor, so it is ALSO expressible
# as JVM column math (whole-stage codegen, no Python at all) — the
# preferred form for hot paths like kNN corpus indexing. Bit-identical
# to the numpy kernel and the SQL twins (same constants, same op order).

def hexround_cols(qf: Column, rf: Column) -> tuple[Column, Column]:
    """Column twin of hex.hexround (cube rounding, floor(x+0.5))."""
    yf = -qf - rf
    rx = F.floor(qf + F.lit(0.5))
    ry = F.floor(yf + F.lit(0.5))
    rz = F.floor(rf + F.lit(0.5))
    dx = F.abs(rx - qf)
    dy = F.abs(ry - yf)
    dz = F.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = (~fix_x) & (~(dy > dz))
    q = F.when(fix_x, -ry - rz).otherwise(rx)
    r = F.when(fix_z, -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def frac_axial_cols(lat, lon, res: int) -> tuple[Column, Column]:
    """FRACTIONAL Column twin of hex.frac_axial — the ONE place the
    'q0f = lon*C1 - lat*C2; M^R product' op sequence is written as
    Columns (mirrors hex.frac_axial_sql term for term)."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    q0f = lon * F.lit(H.C1) - lat * F.lit(H.C2)
    r0f = lat * F.lit(H.C3)
    a, b, c, d = H.m_pow(res)
    qf = F.lit(float(a)) * q0f + F.lit(float(b)) * r0f
    rf = F.lit(float(c)) * q0f + F.lit(float(d)) * r0f
    return qf, rf


def axial_cols(lat, lon, res: int) -> tuple[Column, Column]:
    """Column twin of hex.latlon_to_axial: integer axial cell coords."""
    return hexround_cols(*frac_axial_cols(lat, lon, res))


def parent_axial_cols(q: Column, r: Column) -> tuple[Column, Column]:
    """Column twin of hex._parent_axial (one res coarser)."""
    pq = (F.lit(3.0) * q + F.lit(1.0) * r) / F.lit(7.0)
    pr = (F.lit(-1.0) * q + F.lit(2.0) * r) / F.lit(7.0)
    return hexround_cols(pq, pr)
