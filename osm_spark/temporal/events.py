"""Event-stream rollups: time-weighted averages + funnel conversion.

The analytics layer over the engine's event/temporal machinery (the
as-of annotation joins in temporal/annotate.py resolve WHICH version
was live at t; these operators aggregate HOW LONG each state was live
and in WHAT ORDER stages happened) — the two queries every telemetry
or user-journey pipeline runs:

- **Time-weighted average**: a sampled metric (price, queue depth,
  sensor reading) holds its value until the next observation; the
  honest mean weights each value by its holding duration, not by
  sample count (burst-sampled periods would otherwise dominate).
- **Funnel**: ordered stage conversion (view -> click -> purchase):
  a user converts stage k only if stage k's event happens AFTER their
  stage k-1 conversion — min-over-constrained-window, not mere
  presence.

Spark-first shapes:

- Both are ONE user-keyed shuffle: TWA is a lead() window + one
  aggregation; the funnel is chained conditional window minima over
  the SAME partition key (Catalyst reuses one exchange+sort for all
  stages) + one output-sized rollup.
- Integer discipline: durations in int64 µs, values quantized to
  int64 BEFORE the duration product (the product is capped by
  quantized_value * total_ms — callers pick the quantization so this
  stays < 2^63; the default e3 scale holds to ~300 years per user at
  value 10^6), and the TWA emits as an exact integer fixed point
  wsum DIV total — no float summation anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def time_weighted_avg(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_q_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-user duration-weighted mean of an already-quantized value.

    Each observation holds until the user's next one; the last
    observation holds zero time (no information past it — the standard
    right-open convention).  Users with a single event have no
    duration and report twa_q = their value (the only observed state).

    Returns (user, n_obs, total_ms, wsum, twa_q) with
    wsum = sum(value_q * held_ms) and twa_q = wsum DIV total_ms —
    all exact int64.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    seg = events.select(
        F.col(user_col).alias("u"),
        F.col(value_q_col).alias("vq"),
        (F.coalesce(_us(F.lead(ts_col).over(w)), _us(ts_col))
         - _us(ts_col)).alias("held_us"),
    ).select(
        # integer DIV, not float /: DuckDB rounds double->int casts
        # where Spark truncates, so a float ms conversion would split
        # the engines on .5 boundaries
        "u", "vq", F.expr("held_us DIV 1000").alias("held_ms"),
    )
    return seg.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("held_ms").cast("long").alias("total_ms"),
        F.sum(F.col("vq") * F.col("held_ms")).cast("long").alias("wsum"),
        F.when(
            F.sum("held_ms") == 0, F.min("vq")
        ).otherwise(
            F.expr("sum(vq * held_ms) DIV sum(held_ms)")
        ).cast("long").alias("twa_q"),
    ).withColumnRenamed("u", user_col)


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered-stage conversion rollup.

    A user reaches stage k at the EARLIEST event of type stages[k]
    that is strictly after their stage k-1 time (stage 0 is an
    unconstrained min).  Emits one row per stage:

        stage_idx, stage, n_reached, sum_latency_us

    where latency is stage-k time minus stage-0 time summed over the
    users who reached k (exact int64; latency of stage 0 is 0).

    Plan shape: every per-stage minimum is a conditional aggregate
    over the SAME user window — one exchange + one sort total — and
    the stage rollup is output-sized (|stages| rows).
    """
    w = Window.partitionBy("u")
    cur = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        _us(ts_col).alias("ts_us"),
    )
    stage_cols = []
    prev: Column | None = None
    for k, s in enumerate(stages):
        cond = F.col("t") == s
        if prev is not None:
            cond = cond & (F.col("ts_us") > prev)
        c = F.min(F.when(cond, F.col("ts_us"))).over(w)
        cur = cur.withColumn(f"_s{k}", c)
        prev = F.col(f"_s{k}")
        stage_cols.append(f"_s{k}")
    per_user = cur.groupBy("u").agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )
    spark = events.sparkSession
    sdf = F.broadcast(
        spark.createDataFrame(
            [(k, s) for k, s in enumerate(stages)],
            "stage_idx int, stage string",
        )
    )
    longs = per_user.select(
        "u",
        F.array(*[F.col(c) for c in stage_cols]).alias("ts_arr"),
    )
    reached = (
        longs.crossJoin(sdf)
        .where(F.element_at("ts_arr", F.col("stage_idx") + 1).isNotNull())
        .select(
            "stage_idx",
            "stage",
            (
                F.element_at("ts_arr", F.col("stage_idx") + 1)
                - F.element_at("ts_arr", 1)
            ).alias("lat_us"),
        )
    )
    agg = reached.groupBy("stage_idx", "stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum("lat_us").cast("long").alias("sum_latency_us"),
    )
    # every stage emits a row — a stage nobody reached reports 0, it
    # does not vanish from the funnel
    return sdf.join(F.broadcast(agg), ["stage_idx", "stage"], "left").select(
        "stage_idx", "stage",
        F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
        F.coalesce("sum_latency_us", F.lit(0)).cast("long")
        .alias("sum_latency_us"),
    )
