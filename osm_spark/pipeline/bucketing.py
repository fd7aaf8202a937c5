"""Bucketed tables — co-located joins with no shuffle.

The 100 TB join story: element histories, tile assignments and
annotation children are all repeatedly joined on the same keys
(element id / ref / cell). Writing both sides bucketed on the join key
(Spark ``bucketBy`` — the Iceberg bucket-partition-transform analog)
lets every subsequent join run WITHOUT an Exchange on either side: the
bucket layout IS the shuffle, paid once at write time and amortized
over every downstream join. `tests/test_bucketing.py` asserts the
exchange-free plan.

Sorting within buckets (``sortBy``) additionally removes the join-time
Sort for sort-merge joins, and gives min/max-pruned scans on the sort
key — the same reason the engine range-partitions tile output by the
quadkey value (scripts/run_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cogrouped_tables(
    spark: SparkSession, left: str, right: str, on: list[str],
    force_sort_merge: bool = True,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the plan contains NO Exchange (verify with
    ``df.explain()``); at cluster scale each task reads one bucket from
    each side locally. ``force_sort_merge`` hints the left INPUT (a
    hint on the joined frame is a no-op) so a small side doesn't
    degrade the demo into a broadcast."""
    l = spark.table(left)
    if force_sort_merge:
        l = l.hint("merge")
    return l.join(spark.table(right), on)
