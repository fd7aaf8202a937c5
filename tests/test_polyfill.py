"""Hex polyfill (geo/polyfill.py) vs a brute-force integer mirror,
plus center-containment contract cases."""

import math

from osm_spark.geo import hex as H
from osm_spark.geo.polyfill import hex_polyfill

OFF = [(2, 0), (1, 2), (-1, 2), (-2, 0), (0, -2)]


def _mk_polys(n):
    polys = []
    for pid in range(n):
        cx = (pid * 7919 % 60000) * 1000 - 30_000_000
        cy = (pid * 4099 % 30000) * 1000 - 15_000_000
        s = (pid % 3 + 1) * 400_000
        polys.append((pid, [(cx + dx * s, cy + dy * s) for dx, dy in OFF]))
    return polys


def _frac_axial(lat, lon, res):
    a, b, c, d = H.m_pow(res)
    q0 = lon * H.C1 - lat * H.C2
    r0 = lat * H.C3
    return float(a) * q0 + float(b) * r0, float(c) * q0 + float(d) * r0


def _center(q, r, res):
    a, b, c, d = H.m_pow(res)
    det = float(7 ** res)
    q0 = (float(d) * q - float(b) * r) / det
    r0 = (float(-c) * q + float(a) * r) / det
    lat = r0 / H.C3
    lon = (q0 + lat * H.C2) / H.C1
    return lon, lat


def _pip(verts, px, py):
    c = 0
    for k in range(len(verts)):
        xj, yj = verts[k]
        xi, yi = verts[k - 1]
        if (yi > py) != (yj > py):
            t = (xj - xi) * (py - yi) - (px - xi) * (yj - yi)
            if (t > 0) if yj > yi else (t < 0):
                c += 1
    return c % 2 == 1


def _mirror(polys, res):
    want = set()
    for pid, verts in polys:
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        qs, rs = [], []
        for x in (min(xs), max(xs)):
            for y in (min(ys), max(ys)):
                qf, rf = _frac_axial(y / 1e6, x / 1e6, res)
                qs.append(qf)
                rs.append(rf)
        for q in range(math.floor(min(qs)) - 3, math.floor(max(qs)) + 4):
            for r in range(math.floor(min(rs)) - 3, math.floor(max(rs)) + 4):
                lon, lat = _center(q, r, res)
                if _pip(verts, math.floor(lon * 1e6), math.floor(lat * 1e6)):
                    want.add((pid, q, r))
    return want


def _run(spark, polys, res):
    df = spark.createDataFrame(
        [(p, [{"x": x, "y": y} for x, y in v]) for p, v in polys],
        "poly_id long, verts array<struct<x:long,y:long>>",
    )
    return {(r.poly_id, r.q, r.r) for r in hex_polyfill(df, res).collect()}


def test_matches_mirror_res4(spark):
    polys = _mk_polys(10)
    got = _run(spark, polys, 4)
    assert got == _mirror(polys, 4)
    assert len(got) > 30


def test_matches_mirror_res3_and_5(spark):
    polys = _mk_polys(5)
    for res in (3, 5):
        assert _run(spark, polys, res) == _mirror(polys, res)


def test_every_cell_center_is_inside(spark):
    polys = _mk_polys(4)
    got = _run(spark, polys, 4)
    by_pid = dict(polys)
    for pid, q, r in got:
        lon, lat = _center(q, r, 4)
        assert _pip(by_pid[pid], math.floor(lon * 1e6), math.floor(lat * 1e6))


def test_tiny_polygon_yields_no_cells(spark):
    # smaller than any res-3 cell and placed between centers
    polys = [(0, [(5_000_001 + dx, 5_000_001 + dy)
                  for dx, dy in [(2, 0), (0, 2), (-2, 0), (0, -2)]])]
    got = _run(spark, polys, 3)
    want = _mirror(polys, 3)
    assert got == want  # usually empty; mirror is the contract either way


def _compact_mirror(cells, res):
    """Brute mirror of hex_compact over (pid, q, r) sets."""
    from osm_spark.geo import hex as HH
    import numpy as np

    def parent(q, r):
        pq, pr = HH._parent_axial(np.array([q]), np.array([r]))
        return int(pq[0]), int(pr[0])

    out = set()
    cur = {(pid, q, r) for pid, q, r in cells}
    for rv in range(res, 0, -1):
        groups = {}
        for pid, q, r in cur:
            groups.setdefault((pid, *parent(q, r)), []).append((pid, q, r))
        nxt = set()
        for (pid, pq, pr), members in groups.items():
            if len(members) == 7:
                nxt.add((pid, pq, pr))
            else:
                out.update((p, rv, q, r) for p, q, r in members)
        cur = nxt
    out.update((p, 0, q, r) for p, q, r in cur)
    return out


def test_compact_matches_mirror_and_conserves_area(spark):
    from osm_spark.geo.polyfill import hex_compact

    polys = _mk_polys(8)
    res = 5
    cells = _run(spark, polys, res)  # (pid, q, r) polyfill ground truth
    df = spark.createDataFrame(
        [(p, q, r) for p, q, r in cells], "poly_id long, q long, r long"
    )
    got = {
        (r.poly_id, r.res, r.q, r.r)
        for r in hex_compact(df, res).collect()
    }
    assert got == _compact_mirror(cells, res)
    # conservation: expanding every compacted cell back to res-5
    # children reproduces the input exactly
    area = sum(7 ** (res - rv) for _, rv, _, _ in got)
    assert area == len(cells)
    assert any(rv < res for _, rv, _, _ in got)  # compaction fired


def test_cover_join_matches_cell_semantics(spark):
    """hex_cover_join = 'point's ancestor chain hits the compacted
    cover' — verified against the polyfill ground truth: a point whose
    res-5 cell is in the polyfill must join (compact conserves the
    cell set exactly), and every joined point's res-5 cell must be in
    the polyfill."""
    import numpy as np

    from osm_spark.geo import hex as HH
    from osm_spark.geo.polyfill import hex_compact, hex_cover_join

    polys = _mk_polys(8)
    res = 5
    cells = _run(spark, polys, res)
    cover = hex_compact(
        spark.createDataFrame(
            [(p, q, r) for p, q, r in cells], "poly_id long, q long, r long"
        ),
        res,
    )
    # probe points: one at each polyfilled cell center (must all hit)
    # plus far-away misses
    probes = [(i, q, r, pid) for i, (pid, q, r) in enumerate(sorted(cells))]
    miss_base = len(probes)
    pts = spark.createDataFrame(
        [(i, q, r) for i, q, r, _ in probes]
        + [(miss_base + k, 10_000 + k, -10_000 - k) for k in range(5)],
        "pt long, q long, r long",
    )
    got = {
        (r.pt, r.poly_id) for r in hex_cover_join(pts, cover, res).collect()
    }
    want = {
        (i, pid2)
        for i, q, r, _ in probes
        for (pid2, q2, r2) in cells
        if q2 == q and r2 == r  # overlapping pentagons join every owner
    }
    assert got == want and len(got) >= len(probes)
