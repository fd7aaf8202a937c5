"""Gap-based sessionization of an event stream.

Web-analytics counterpart of the reference's changeset assembly (a
changeset IS a user session of edits bounded by inactivity — reference
changeset.go groups element edits per user window); here the generic
form: events sessionize per user with an idle-gap threshold, then roll
up per-session metrics.

Spark-first shape:

- **Two window passes, one shuffle**: both the lag-gap flag and the
  running session index partition by user — ONE hash exchange on
  user_id feeds both window functions AND the final per-session
  aggregation (same key prefix), so Catalyst reuses the partitioning.
- **Integer-exact**: timestamps compare as int64 epoch microseconds
  (`unix_micros`), monetary values quantize to int64 cents BEFORE the
  sum, so the rollup is order-independent and engine-exact.
- At 10^12 events the per-user partitions are the natural skew unit;
  a bot user with millions of events skews the window — cap with a
  per-(user, day) pre-split upstream if the log has such keys (the
  windowed rule is associative across day boundaries except at the
  seam, which a second seam-merge pass resolves; not needed at test
  scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_US = 1_800 * 1_000_000  # 30 min idle gap


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """events + (us, sess_idx): 0-based session index per user.

    A new session starts when the gap since the previous event of the
    same user EXCEEDS ``gap_us`` (strict >, first event always starts
    session 0).  Ordering ties on identical timestamps break by
    ``id_col`` so the index is deterministic in both engines.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    prev = F.lag("us").over(w)
    new_sess = (
        F.when(prev.isNull() | ((F.col("us") - prev) > F.lit(int(gap_us))), 1)
        .otherwise(0)
    )
    run = Window.partitionBy(user_col).orderBy("us", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("us", us)
        .withColumn("_new", new_sess)
        .withColumn("sess_idx", (F.sum("_new").over(run) - 1).cast("long"))
        .drop("_new")
    )


def session_rollup(
    sessions: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session metrics: bounds, duration, event mix, spend.

    ``value`` quantizes to cents (int64) per event before summing —
    double sums are never emitted raw (engine/order parity).
    """
    cents = F.floor(F.col(value_col) * 100).cast("long")
    return sessions.groupBy(user_col, "sess_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum((F.col(type_col) == "purchase").cast("long")).alias("n_purchases"),
        F.sum(cents).alias("value_cents"),
    )
