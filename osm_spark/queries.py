"""Registry of driver-checked queries + DuckDB oracle SQL.

Each operator implemented from SURVEY.md §2 (and the training-data-pipeline
extensions) registers a (spark_fn, oracle_sql) pair here. Spark fns take
``(spark, sf_dir)`` and return a DataFrame; oracle SQL runs in DuckDB over
pre-registered views of the same parquet tables.

Cross-engine float discipline:
- pure +,-,*,/ double math is IEEE-identical in both engines — safe raw;
- transcendental results (ln/tan/atan/exp, haversine) are quantized with
  ``floor(x * 10^k)`` (libm may differ by 1 ulp between JVM and C++);
- unordered SUM over doubles is never emitted raw: terms are quantized to
  int64 first so the sum is exact and order-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_spark.core import ids
from osm_spark.geo import tiles
from osm_spark.pipeline import pages

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# Tile math family (SURVEY §1.5, §2.8 — orb/maptile semantics)
# =====================================================================

_Z = 12

@register(
    "tile_assign",
    f"""
    SELECT {tiles.tile_x_sql(pages.GEO_LON_SQL, _Z)} AS tile_x,
           {tiles.tile_y_sql(pages.GEO_LAT_SQL, _Z)} AS tile_y,
           count(*) AS n_pages
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kernel: geocode -> tile.At(p, z=12) -> count per tile.

    maptile.At semantics (SURVEY §1.5); one shuffle, map-side combine.
    """
    return pages.tile_counts(spark, sf_dir, _Z).drop("zoom")


def _pyramid_oracle(z_max: int, z_min: int) -> str:
    base = f"""
    WITH base AS (
      SELECT {tiles.tile_x_sql(pages.GEO_LON_SQL, z_max)} AS x,
             {tiles.tile_y_sql(pages.GEO_LAT_SQL, z_max)} AS y,
             count(*) AS n FROM documents GROUP BY 1, 2)
    """
    parts = [
        f"SELECT x >> {z_max - z} AS tile_x, y >> {z_max - z} AS tile_y, "
        f"CAST(sum(n) AS BIGINT) AS n_pages, {z} AS zoom FROM base GROUP BY 1, 2"
        for z in range(z_max, z_min - 1, -1)
    ]
    return base + " UNION ALL ".join(parts)


@register("tile_pyramid", _pyramid_oracle(10, 4))
def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zoom pyramid z4..z10 via parent-shift rollup (tile.Range math);
    pages are scanned once, rollups run on the per-tile table only."""
    df = pages.tile_pyramid_counts(spark, sf_dir, z_max=10, z_min=4)
    return df.select(
        "tile_x", "tile_y", F.col("n_pages").cast("long").alias("n_pages"), "zoom"
    )


_BOUNDS9 = tiles.tile_bound_sql("x", "y", 9)

@register(
    "tile_bounds",
    f"""
    WITH t AS (
      SELECT DISTINCT {tiles.tile_x_sql(pages.GEO_LON_SQL, 9)} AS x,
                      {tiles.tile_y_sql(pages.GEO_LAT_SQL, 9)} AS y
      FROM documents)
    SELECT x AS tile_x, y AS tile_y,
           CAST(floor({_BOUNDS9['minlat']} * 1000000.0) AS BIGINT) AS minlat_e6,
           CAST(floor({_BOUNDS9['maxlat']} * 1000000.0) AS BIGINT) AS maxlat_e6,
           CAST(floor({_BOUNDS9['minlon']} * 1000000.0) AS BIGINT) AS minlon_e6,
           CAST(floor({_BOUNDS9['maxlon']} * 1000000.0) AS BIGINT) AS maxlon_e6
    FROM t
    """,
)
def q_tile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile.Bound() back-projection (reference bounds.go:18-34) for every
    distinct z9 tile touched by pages; micro-degree quantized."""
    pts = pages.page_points(spark, sf_dir)
    t = pts.select(
        tiles.tile_x("lon", 9).alias("tile_x"), tiles.tile_y("lat", 9).alias("tile_y")
    ).distinct()
    return t.select(
        "tile_x",
        "tile_y",
        F.floor(tiles.tile_bound_south("tile_y", 9) * 1e6).alias("minlat_e6"),
        F.floor(tiles.tile_bound_north("tile_y", 9) * 1e6).alias("maxlat_e6"),
        F.floor(tiles.tile_bound_west("tile_x", 9) * 1e6).alias("minlon_e6"),
        F.floor(tiles.tile_bound_east("tile_x", 9) * 1e6).alias("maxlon_e6"),
    )


@register(
    "tile_quadkey",
    f"""
    SELECT doc_id,
           {tiles.quadkey_sql(tiles.tile_x_sql(pages.GEO_LON_SQL, 8),
                              tiles.tile_y_sql(pages.GEO_LAT_SQL, 8), 8)} AS qk
    FROM documents
    """,
)
def q_tile_quadkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey encoding (interleaved child-index digits — the same shift
    math as tile child/parent navigation, SURVEY §1.5)."""
    pts = pages.page_points(spark, sf_dir)
    return pts.select(
        "doc_id",
        tiles.quadkey(
            tiles.tile_x("lon", 8), tiles.tile_y("lat", 8), 8
        ).alias("qk"),
    )


@register(
    "tile_containment",
    f"""
    WITH p AS (
      SELECT doc_id, {pages.GEO_LAT_SQL} AS lat, {pages.GEO_LON_SQL} AS lon,
             {tiles.tile_x_sql(pages.GEO_LON_SQL, 7)} AS x,
             {tiles.tile_y_sql(pages.GEO_LAT_SQL, 7)} AS y
      FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN lat >= {tiles.tile_bound_sql('x','y',7)['minlat']}
                          AND lat <= {tiles.tile_bound_sql('x','y',7)['maxlat']}
                          AND lon >= {tiles.tile_bound_sql('x','y',7)['minlon']}
                          AND lon <= {tiles.tile_bound_sql('x','y',7)['maxlon']}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_contained
    FROM p
    """,
)
def q_tile_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bounds.ContainsNode (reference bounds.go:38-48) property: every
    point is inside the bounds of its own tile (inclusive bbox)."""
    pts = pages.page_points(spark, sf_dir)
    p = pts.select(
        "lat",
        "lon",
        tiles.tile_x("lon", 7).alias("x"),
        tiles.tile_y("lat", 7).alias("y"),
    )
    b = p.select(
        "lat",
        "lon",
        tiles.tile_bound_south("y", 7).alias("minlat"),
        tiles.tile_bound_north("y", 7).alias("maxlat"),
        tiles.tile_bound_west("x", 7).alias("minlon"),
        tiles.tile_bound_east("x", 7).alias("maxlon"),
    )
    return b.agg(
        F.count("*").alias("n_total"),
        F.sum(
            tiles.contains("lat", "lon", "minlat", "maxlat", "minlon", "maxlon").cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_contained"),
    )


# =====================================================================
# Packed-id family (SURVEY §1.2, §2.8 — feature.go/element.go bit math)
# =====================================================================

@register(
    "ids_pack_roundtrip",
    f"""
    SELECT (o_orderkey << 16) | {ids.NODE_MASK} | (o_orderkey % 7 + 1) AS eid,
           o_orderkey AS ref,
           CAST(o_orderkey % 7 + 1 AS INT) AS version,
           'node' AS typ,
           'node/' || CAST(o_orderkey AS VARCHAR) || ':' ||
               CAST(o_orderkey % 7 + 1 AS VARCHAR) AS id_str
    FROM orders
    """,
)
def q_ids_pack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack (type, ref, version) -> int64 ElementID with the exact
    reference masks (feature.go:62-77), then unpack + string-format
    (element.go:76-127). Sorting the packed long is (type, ref, version)
    order — the reference's clustered sort key."""
    orders = _t(spark, sf_dir, "orders")
    ver = (F.col("o_orderkey") % 7 + 1).cast("int")
    packed = ids.eid("node", F.col("o_orderkey"), ver)
    return orders.select(
        packed.alias("eid"),
        ids.ref_of(packed).alias("ref"),
        ids.version_of(packed).alias("version"),
        ids.type_of(packed).alias("typ"),
        ids.id_string(packed).alias("id_str"),
    )


@register(
    "ids_counts",
    f"""
    WITH u AS (
      SELECT (o_orderkey << 16) | {ids.NODE_MASK} AS fid FROM orders
      UNION ALL
      SELECT (c_custkey << 16) | {ids.WAY_MASK} FROM customer
      UNION ALL
      SELECT (s_suppkey << 16) | {ids.RELATION_MASK} FROM supplier)
    SELECT CASE fid & {ids.TYPE_MASK}
             WHEN {ids.NODE_MASK} THEN 'node'
             WHEN {ids.WAY_MASK} THEN 'way'
             WHEN {ids.RELATION_MASK} THEN 'relation' END AS typ,
           count(*) AS n
    FROM u GROUP BY 1
    """,
)
def q_ids_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureIDs.Counts() (feature.go:182-195) as groupBy(type).count()
    over a union of packed ids from three element types."""
    orders = _t(spark, sf_dir, "orders").select(
        ids.feature_id("node", "o_orderkey").alias("fid")
    )
    cust = _t(spark, sf_dir, "customer").select(
        ids.feature_id("way", "c_custkey").alias("fid")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        ids.feature_id("relation", "s_suppkey").alias("fid")
    )
    u = orders.unionByName(cust).unionByName(supp)
    return u.groupBy(ids.type_of("fid").alias("typ")).agg(F.count("*").alias("n"))
