"""Convex hull — exact-integer monotone chain + hull-of-hulls merge.

The reference ecosystem's planar package exposes convex-hull style
bound/extent reductions over element geometries (reference
`osmgeojson`/bound machinery reduces ways to bboxes; the hull is the
exact polygon refinement of that reduction).  This module computes
hulls over e6-quantized int64 coordinates, so every orientation test
is an exact integer cross product — no epsilon, no float surface, and
the DuckDB oracle can re-derive hull membership with the same integer
predicate (an edge (a,b) is a hull edge iff every other point is
STRICTLY left of a->b).

Scale shape: the hull is an associative reduction — the hull of a
union is the hull of the per-part hulls (``merge``).  At corpus scale
that is per-partition hulls (each bounded by the partition) merged
pairwise; per-way hulls (the query below) are way-sized groups through
one Arrow kernel.  Collinear interior points are NOT hull vertices
(strict turns), matching the strict-left SQL predicate.
"""

from __future__ import annotations

import numpy as np


def _cross(ox: int, oy: int, ax: int, ay: int, bx: int, by: int) -> int:
    """Exact z of (a-o) x (b-o).  e6 world coords keep every product
    < 2^55, far inside int64."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def convex_hull(xs, ys) -> list[tuple[int, int]]:
    """Counterclockwise hull vertices (strict — no collinear points),
    starting at the lexicographically smallest point.  Andrew's
    monotone chain over deduplicated int points."""
    pts = sorted(set(zip((int(v) for v in xs), (int(v) for v in ys))))
    if len(pts) <= 2:
        return pts
    def chain(seq):
        st: list[tuple[int, int]] = []
        for p in seq:
            while (
                len(st) >= 2
                and _cross(st[-2][0], st[-2][1], st[-1][0], st[-1][1],
                           p[0], p[1]) <= 0
            ):
                st.pop()
            st.append(p)
        return st
    lower = chain(pts)
    upper = chain(reversed(pts))
    hull = lower[:-1] + upper[:-1]
    # < 3 only when every point is collinear: the hull degenerates to
    # the segment between the lexicographic extremes
    return hull if len(hull) >= 3 else [pts[0], pts[-1]]


def merge(*hulls) -> list[tuple[int, int]]:
    """Hull of a union via the per-part hulls — the associative
    reduction used for corpus-scale per-partition rollups."""
    xs: list[int] = []
    ys: list[int] = []
    for h in hulls:
        for x, y in h:
            xs.append(x)
            ys.append(y)
    return convex_hull(xs, ys)


def area2(hull: list[tuple[int, int]]) -> int:
    """Twice the signed area (shoelace over the CCW ring) — exact
    int64; equals the SQL oracle's per-edge cross sum."""
    n = len(hull)
    if n < 3:
        return 0
    s = 0
    for i in range(n):
        ax, ay = hull[i]
        bx, by = hull[(i + 1) % n]
        s += ax * by - bx * ay
    return s


def hull_stats_kernel(pdf):
    """applyInPandas kernel: one group = one way's points
    (way_id, x, y rows) → hull structural stats the SQL edge-oracle
    recomputes: vertex count, vertex coordinate sums, exact 2*area."""
    import pandas as pd

    h = convex_hull(pdf.x.to_numpy(), pdf.y.to_numpy())
    return pd.DataFrame(
        {
            "way_id": np.array([pdf.way_id.iloc[0]], dtype=np.int64),
            "n_hull": np.array([len(h)], dtype=np.int64),
            "hx_sum": np.array([sum(p[0] for p in h)], dtype=np.int64),
            "hy_sum": np.array([sum(p[1] for p in h)], dtype=np.int64),
            "area2": np.array([area2(h)], dtype=np.int64),
        }
    )


HULL_STATS_SCHEMA = (
    "way_id long, n_hull long, hx_sum long, hy_sum long, area2 long"
)
