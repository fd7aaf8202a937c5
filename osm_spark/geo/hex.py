"""H3-style aperture-7 hexagonal hierarchical cell index.

A from-scratch, dependency-free realization of the H3 *operator
semantics* the north star mandates — hexagonal cells, aperture-7
parent/child hierarchy, 64-bit cell ids with a base-cell + 3-bit digit
chain layout, k_ring in axial hex coordinates, cell_to_parent /
cell_to_children — implemented as vectorized numpy kernels inside
pandas/Arrow UDFs (no per-row Python). The one deliberate deviation
from Uber's H3 (whose library is absent from this sandbox) is the base
projection: cells live on the equirectangular (lon, lat) plane rather
than the icosahedral gnomonic faces. Every *operator* (hierarchy,
ring expansion, containment joins, rollups) is identical; only where
cell boundaries fall on the globe differs, which no join/agg plan
depends on.

Reference parity note: this module plays the role the Z/X/Y maptile
grid plays for the reference (SURVEY §2.8, reference maptile/tile.go) —
a hierarchical spatial key — with hexes instead of squares (uniform
6-neighborhoods, the property kNN ring expansion wants).

Math (all +,-,*,/ on IEEE doubles, identical op order in the numpy
kernel and the SQL twins, so every engine computes bit-identical cells):

- fractional axial coords at res 0 (pointy-top hexes, circumradius
  ``S0`` degrees):  q0f = lon*C1 - lat*C2,  r0f = lat*C3
  with C1 = sqrt(3)/(3*S0), C2 = 1/(3*S0), C3 = 2/(3*S0).
- aperture-7 sublattice matrix in axial coords: M = [[2, -1], [1, 3]]
  (det 7; columns are the res-(r+1) images of the res-r basis). The
  same point's fractional coords at res R are M^R @ (q0f, r0f).
- integer cell = hexround(frac): cube-coordinate rounding with
  floor(x + 0.5) (NOT banker's round — DuckDB and numpy disagree on
  ties; floor(x+0.5) is identical everywhere).
- digit chain: parent = hexround(M^-1 @ f) (exact: denominators of 7
  never land on rounding boundaries), digit = f - M @ parent, one of
  the 7 coset offsets D below. Base cell = the res-0 cell.

ID layout (64-bit, H3-flavored)::

    bit 63      0 (sign)
    bits 59-62  mode = 1 (hex cell)
    bits 55-58  resolution 0..15
    bits 45-54  base cell (packed res-0 axial, 10 bits)
    bits 0-44   15 x 3-bit digits, digit for res 1 in the HIGH slot;
                unused slots (res+1..15) padded with 7 (like H3)
"""

from __future__ import annotations

import math

import numpy as np

S0 = 25.0  # res-0 hex circumradius in plane degrees
C1 = math.sqrt(3.0) / (3.0 * S0)
C2 = 1.0 / (3.0 * S0)
C3 = 2.0 / (3.0 * S0)

# aperture-7 sublattice matrix and inverse (axial coords)
M = ((2, -1), (1, 3))
# M^-1 = 1/7 * [[3, 1], [-1, 2]]

# the 7 coset offsets (digit vectors): center + 6 axial neighbors
DIGITS = ((0, 0), (1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1))
_DIGIT_INDEX = {v: i for i, v in enumerate(DIGITS)}

MAX_RES = 15
_BASE_OFF = 16  # res-0 axial range is well inside [-16, 15]
_BASE_SPAN = 32

MODE_BITS = 59
RES_BITS = 55
BASE_BITS = 45


def m_pow(res: int) -> tuple[int, int, int, int]:
    """Integer entries (a, b, c, d) of M^res (row-major)."""
    a, b, c, d = 1, 0, 0, 1
    for _ in range(res):
        a, b, c, d = 2 * a - c, 2 * b - d, a + 3 * c, b + 3 * d
    return a, b, c, d


def hexround(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-coordinate hex rounding, floor(x+0.5) flavor (vectorized).

    Identical operation order to :func:`axial_sql` so DuckDB reproduces
    the exact same integers on the exact same doubles.
    """
    yf = -qf - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def frac_axial(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Fractional axial coords of plane points at ``res`` (vectorized)."""
    q0f = lon * C1 - lat * C2
    r0f = lat * C3
    a, b, c, d = m_pow(res)
    qf = float(a) * q0f + float(b) * r0f
    rf = float(c) * q0f + float(d) * r0f
    return qf, rf


def latlon_to_axial(lat, lon, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer axial cell coords at ``res`` (vectorized)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    return hexround(*frac_axial(lat, lon, res))


def _parent_axial(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Parent cell of integer axial coords (one res coarser). Exact:
    M^-1 components have denominator 7, never on a rounding boundary."""
    pq = (3.0 * q + 1.0 * r) / 7.0
    pr = (-1.0 * q + 2.0 * r) / 7.0
    return hexround(pq, pr)


def axial_to_cell(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """Pack integer axial coords at ``res`` into 64-bit cell ids
    (vectorized digit-chain walk, ``res`` iterations)."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    digits = np.zeros(len(q), dtype=np.int64)
    # fill unused low slots with 7s
    for lvl in range(MAX_RES, res, -1):
        digits |= np.int64(7) << np.int64(3 * (MAX_RES - lvl))
    for lvl in range(res, 0, -1):
        pq, pr = _parent_axial(q, r)
        dq = q - (M[0][0] * pq + M[0][1] * pr)
        dr = r - (M[1][0] * pq + M[1][1] * pr)
        # digit index via the coset table: d = 3*dq + dr mapped through
        # a small lookup (dq, dr in {-1, 0, 1})
        didx = _coset_index(dq, dr)
        digits |= didx << np.int64(3 * (MAX_RES - lvl))
        q, r = pq, pr
    base = (q + _BASE_OFF) * _BASE_SPAN + (r + _BASE_OFF)
    if len(base) and (base.min() < 0 or base.max() >= (1 << 10)):
        raise ValueError("res-0 axial coords out of base-cell range")
    return (
        (np.int64(1) << np.int64(MODE_BITS))
        | (np.int64(res) << np.int64(RES_BITS))
        | (base << np.int64(BASE_BITS))
        | digits
    )


_COSET_LUT = np.full((3, 3), -1, dtype=np.int64)
for _i, (_dq, _dr) in enumerate(DIGITS):
    _COSET_LUT[_dq + 1, _dr + 1] = _i


def _coset_index(dq: np.ndarray, dr: np.ndarray) -> np.ndarray:
    idx = _COSET_LUT[dq + 1, dr + 1]
    if len(idx) and idx.min() < 0:
        raise AssertionError("digit residual outside aperture-7 coset set")
    return idx


def latlon_to_cell(lat, lon, res: int) -> np.ndarray:
    """lat/lon -> 64-bit cell id at ``res`` (the H3 encode)."""
    q, r = latlon_to_axial(lat, lon, res)
    return axial_to_cell(q, r, res)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(RES_BITS)) & np.int64(0xF)


def cell_to_axial(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unpack cell ids -> (res, q, r) at the cell's own resolution.
    Vectorized; mixed resolutions allowed."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    base = (cell >> np.int64(BASE_BITS)) & np.int64(0x3FF)
    q = base // _BASE_SPAN - _BASE_OFF
    r = base % _BASE_SPAN - _BASE_OFF
    dq_lut = np.array([d[0] for d in DIGITS] + [0], dtype=np.int64)
    dr_lut = np.array([d[1] for d in DIGITS] + [0], dtype=np.int64)
    for lvl in range(1, MAX_RES + 1):
        digit = (cell >> np.int64(3 * (MAX_RES - lvl))) & np.int64(7)
        active = lvl <= res
        d = np.where(active, digit, np.int64(7))
        nq = M[0][0] * q + M[0][1] * r + dq_lut[d]
        nr = M[1][0] * q + M[1][1] * r + dr_lut[d]
        q = np.where(active, nq, q)
        r = np.where(active, nr, r)
    return res, q, r


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Truncate the digit chain: keep digits 1..parent_res, pad with 7s."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if len(cell) and (res < parent_res).any():
        raise ValueError("parent_res coarser than some cell's resolution")
    keep_bits = 3 * (MAX_RES - parent_res)
    pad = np.int64((1 << keep_bits) - 1)  # all-7s in the dropped slots
    out = (cell | pad) & ~(np.int64(0xF) << np.int64(RES_BITS))
    out |= np.int64(parent_res) << np.int64(RES_BITS)
    return out


def cell_to_children(cell: int) -> np.ndarray:
    """The 7 aperture-7 children of one cell (one res finer)."""
    arr = np.asarray([cell], dtype=np.int64)
    res = int(cell_res(arr)[0])
    if res >= MAX_RES:
        raise ValueError("cell already at max resolution")
    child_res = res + 1
    slot = np.int64(3 * (MAX_RES - child_res))
    base = (arr[0] & ~(np.int64(7) << slot)) & ~(np.int64(0xF) << np.int64(RES_BITS))
    base |= np.int64(child_res) << np.int64(RES_BITS)
    return np.array([base | (np.int64(d) << slot) for d in range(7)], dtype=np.int64)


def hex_distance(q1, r1, q2, r2):
    """Hex grid distance between axial coords (vectorized)."""
    dq = np.asarray(q1) - np.asarray(q2)
    dr = np.asarray(r1) - np.asarray(r2)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def ring_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets with hex distance <= k (1 + 3k(k+1) of them),
    in (dq, dr) lexicographic order."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= k:
                out.append((dq, dr))
    return out


def k_ring(cell: int, k: int) -> np.ndarray:
    """Cell ids of the filled hex ring of radius ``k`` around ``cell``."""
    arr = np.asarray([cell], dtype=np.int64)
    res, q, r = cell_to_axial(arr)
    offs = ring_offsets(k)
    qs = np.array([q[0] + dq for dq, _ in offs], dtype=np.int64)
    rs = np.array([r[0] + dr for _, dr in offs], dtype=np.int64)
    return axial_to_cell(qs, rs, int(res[0]))


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) of each cell's center (display/refine helper; uses a
    float matrix inverse — NOT part of the cross-engine parity surface)."""
    cell = np.asarray(cell, dtype=np.int64)
    res, q, r = cell_to_axial(cell)
    out_lat = np.empty(len(cell))
    out_lon = np.empty(len(cell))
    for rv in np.unique(res):
        m = res == rv
        a, b, c, d = m_pow(int(rv))
        inv = np.linalg.inv(np.array([[a, b], [c, d]], dtype=np.float64))
        q0 = inv[0, 0] * q[m] + inv[0, 1] * r[m]
        r0 = inv[1, 0] * q[m] + inv[1, 1] * r[m]
        # invert the res-0 fractional transform
        out_lat[m] = r0 / C3
        out_lon[m] = (q0 + out_lat[m] * C2) / C1
    return out_lat, out_lon


# ------------------------------------------------------------- SQL twins
def frac_axial_sql(lat: str, lon: str, res: int) -> tuple[str, str]:
    """FRACTIONAL (qf_expr, rf_expr) ANSI SQL twin of frac_axial — the
    ONE place the 'q0f = lon*C1 - lat*C2; M^R product' op sequence is
    written in SQL.  Every consumer (cell rounding, polyfill corner
    ranges) must build on this so the IEEE op order can never drift
    between twins."""
    a, b, c, d = m_pow(res)
    q0f = f"(({lon}) * {C1!r} - ({lat}) * {C2!r})"
    r0f = f"(({lat}) * {C3!r})"
    qf = f"({float(a)!r} * {q0f} + {float(b)!r} * {r0f})"
    rf = f"({float(c)!r} * {q0f} + {float(d)!r} * {r0f})"
    return qf, rf


def axial_sql(lat: str, lon: str, res: int) -> tuple[str, str]:
    """(q_expr, r_expr) ANSI SQL reproducing latlon_to_axial bit-for-bit
    (same constants via repr, same +,-,*,/ op order, same floor(x+0.5)
    rounding). Expressions are self-contained (no CTE needed)."""
    return hexround_sql(*frac_axial_sql(lat, lon, res))


def hexround_sql(qf: str, rf: str) -> tuple[str, str]:
    """SQL twin of :func:`hexround` on fractional axial expressions."""
    yf = f"(-{qf} - {rf})"
    rx = f"floor({qf} + 0.5)"
    ry = f"floor({yf} + 0.5)"
    rz = f"floor({rf} + 0.5)"
    dx = f"abs({rx} - {qf})"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - {rf})"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN NOT {fix_x} AND NOT ({dy} > {dz}) "
        f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)"
    )
    return q, r


def parent_axial_sql(q: str, r: str) -> tuple[str, str]:
    """SQL twin of :func:`_parent_axial` on INTEGER axial columns."""
    pq = f"((3.0 * ({q}) + 1.0 * ({r})) / 7.0)"
    pr = f"((-1.0 * ({q}) + 2.0 * ({r})) / 7.0)"
    return hexround_sql(pq, pr)
