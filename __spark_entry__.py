"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship geocode->tile-assignment pipeline at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each query; the driver
compares row-count + schema + order-insensitive value-hash at sf0.01.

Column names are aliased identically on both sides; float-producing
aggregations are quantized identically (floor(x * 1e6) style) so IEEE
summation order can't break the value-hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osm_spark.pipeline import pages

    return pages.tile_pyramid_counts(spark, "/root/testdata/sf0.001", z_max=12, z_min=0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.SPARK_QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (omitted => rows-only check)."""
    return Q.ORACLE_SQL
