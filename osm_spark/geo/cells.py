"""Cell indexing + k-nearest-neighbor search.

The engine's cell scheme is the Z/X/Y tile grid (quadkey prefix =
hierarchical containment), which reproduces the reference's maptile
semantics exactly and needs no external libs. H3/S2 encoders slot in
behind the same API when the libraries are present (import-gated; the
sandbox has neither) — the join/kNN plans are identical either way.

kNN = k-ring expand-and-prune (SURVEY §7 step 6):
1. index corpus points by tile at a chosen zoom (cell equi-partition);
2. for each query, probe its cell + expanding square rings (the tile
   k-ring) until >= k candidates are seen at some ring r;
3. refine one extra ring (a point in ring r+1 can be closer than one in
   ring r), compute haversine, take min-k.

Plan shape: queries broadcast; the corpus is hit with an equi-join on
cell keys only — no theta join, no full scan. Hot cells salt via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import distance, tiles

try:  # pragma: no cover - optional accelerators
    import h3  # type: ignore

    HAS_H3 = True
except Exception:  # pragma: no cover
    h3 = None
    HAS_H3 = False


def cell_id(lat, lon, zoom: int):
    """Cell key column: packed tile key at ``zoom`` (tile_key layout)."""
    return tiles.tile_key(
        F.lit(zoom), tiles.tile_x(lon, zoom), tiles.tile_y(lat, zoom)
    )


def k_ring_cells(x: int, y: int, zoom: int, r: int) -> list[tuple[int, int]]:
    """Square k-ring of tile (x, y): all tiles with chebyshev distance
    <= r, clamped to the zoom's valid range (x wraps, y clamps)."""
    n = 1 << zoom
    out = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            ny = y + dy
            if 0 <= ny < n:
                out.append(((x + dx) % n, ny))
    return out


def knn_kring(
    corpus: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int = 5,
    zoom: int = 7,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_ring: int = 8,
) -> DataFrame:
    """k nearest corpus points per query by haversine distance.

    ``queries``: [(qid, lat, lon)]. Driver-side ring expansion picks the
    probe radius per query from corpus cell counts (one cheap aggregate),
    then ONE cell equi-join + per-query top-k does the rest.
    """
    import math

    spark = corpus.sparkSession
    pts = corpus.select(
        F.col(id_col),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        tiles.tile_x(lon_col, zoom).alias("cx"),
        tiles.tile_y(lat_col, zoom).alias("cy"),
    )
    # cell histogram (small: <= 4^zoom rows, in practice |occupied cells|)
    hist = {
        (r.cx, r.cy): r.n
        for r in pts.groupBy("cx", "cy").agg(F.count("*").alias("n")).collect()
    }

    probe_rows = []
    for qid, qlat, qlon in queries:
        n = 1 << zoom
        xf = (qlon + 180.0) / 360.0 * n
        yf = (
            (1.0 - math.log(math.tan(qlat * math.pi / 360.0 + math.pi / 4.0)) / math.pi)
            / 2.0 * n
        )
        qx = min(max(int(math.floor(xf)), 0), n - 1)
        qy = min(max(int(math.floor(yf)), 0), n - 1)
        r = 0
        seen = 0
        while r <= max_ring:
            seen = sum(hist.get(c, 0) for c in k_ring_cells(qx, qy, zoom, r))
            if seen >= k:
                break
            r += 1
        # refine one extra ring: ring-r candidates can be farther than
        # ring-(r+1) ones near cell corners
        for cx, cy in k_ring_cells(qx, qy, zoom, min(r + 1, max_ring)):
            probe_rows.append((qid, float(qlat), float(qlon), cx, cy))

    probes = spark.createDataFrame(
        probe_rows, "qid long, qlat double, qlon double, cx long, cy long"
    )
    # probes side is tiny -> broadcast it; corpus never shuffles
    cand = pts.join(F.broadcast(probes), ["cx", "cy"])
    scored = cand.select(
        "qid",
        F.col(id_col).alias("neighbor"),
        distance.haversine_m("qlat", "qlon", "lat", "lon").alias("dist_m"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(), F.col("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "neighbor", "dist_m")
    )
