"""Bucketed co-located joins: the join plan must contain NO shuffle
Exchange when both sides are bucketed on the join key."""

from pyspark.sql import functions as F

from osm_spark.pipeline.bucketing import cogrouped_tables, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # which is gitignored; dropped in the finally below)
    left = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("w")
    )
    write_bucketed(left, "bkt_left", 4, ["id"], sort_cols=["id"])
    write_bucketed(right, "bkt_right", 4, ["id"], sort_cols=["id"])
    try:
        joined = cogrouped_tables(spark, "bkt_left", "bkt_right", ["id"])
        assert joined.count() == 1000
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # control: the same sort-merge join over unbucketed inputs DOES
        # shuffle both sides
        shuffled = left.hint("merge").join(right, "id")
        assert "Exchange hashpartitioning" in _plan(shuffled)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
