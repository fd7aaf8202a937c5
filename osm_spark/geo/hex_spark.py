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


@pandas_udf("struct<res:int, q:long, r:long>")
def hex_axial(cell: pd.Series) -> pd.DataFrame:
    """Column: unpack a cell id into (res, q, r)."""
    res, q, r = H.cell_to_axial(cell.to_numpy())
    return pd.DataFrame({"res": res.astype("int32"), "q": q, "r": r})


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
