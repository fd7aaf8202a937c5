"""Generic as-of and interval joins — the two classic "Spark lacks
this operator" temporal joins, in their scale-correct formulations.

The engine's asof_annotate (temporal/annotate.py) implements the
reference's OSM-specific version-history semantics; these are the
GENERAL-purpose primitives (pandas merge_asof / KDB aj / Flink
temporal table join) any event pipeline needs:

- **as-of join**: each fact row picks the dimension row with the
  LATEST effective timestamp at or before the fact's timestamp (SCD2
  lookup: "what was the price / config / geo-IP range when this event
  happened").
- **interval join**: each fact row matches every interval containing
  its timestamp (maintenance windows, sessions, campaign flights).

Spark-first shapes:

- The naive as-of formulation is a range join (fact.ts >= dim.ts
  joined on key, then argmax) — a theta join Spark executes as
  broadcast-nested-loop or a key-equi join whose per-key blowup is
  |facts_k| x |dims_k|, quadratic on hot keys.  The scale-correct
  shape is UNION + WINDOW: tag both sides, sort per key by (ts, side),
  and carry the last dimension attributes forward with last(...,
  ignoreNulls) over rows-unbounded-preceding.  ONE key-keyed shuffle,
  no join node at all, per-key cost linear in |facts_k| + |dims_k| —
  a hot key costs a sort, never a product.
- The interval join turns the theta predicate (start <= ts < end)
  into an equi join on TIME BUCKETS — intervals explode to the
  buckets they overlap, facts compute their single bucket, and the
  bucket equi-join + residual predicate refine is exact: a fact's
  bucket intersects an interval's bucket set exactly once, so there
  is no duplicate elimination.  The same trick as the engine's
  spatial cell joins (geo/pip.py), rotated into time; bucket width
  trades explode factor (long intervals) against per-bucket fan-in
  (hot hours) — AQE handles residual hot buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Annotate each fact row with the dimension attributes effective
    at its timestamp (latest dim ``ts_col`` <= fact's; < if strict).

    ``facts`` and ``dim`` must share ``key_col`` and ``ts_col`` names;
    ``attr_cols`` exist only on ``dim``.  Facts keep ALL their
    columns; annotated attrs arrive null when no dim row precedes.
    Dimension ties on (key, ts) resolve to the attrs of the last row
    under Spark's sort (callers wanting determinism dedupe dim first).
    """
    side = "_asof_side"
    fcols = facts.columns
    f_tagged = facts.select(
        "*",
        *[F.lit(None).cast(dim.schema[c].dataType).alias(c)
          for c in attr_cols],
        F.lit(1).alias(side),
    )
    d_tagged = dim.select(
        *[(F.col(c) if c in (key_col, ts_col)
           else F.lit(None).cast(facts.schema[c].dataType)).alias(c)
          for c in fcols],
        *[F.col(c) for c in attr_cols],
        F.lit(0).alias(side),
    )
    # dim rows sort BEFORE facts at equal ts (at-or-before); strict
    # mode sorts them AFTER so an equal-ts dim row is not visible
    order = [F.col(ts_col).asc(),
             F.col(side).asc() if not strict else F.col(side).desc()]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = f_tagged.unionByName(d_tagged).select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in attr_cols],
    )
    return (
        carried.where(F.col(side) == 1)
        .select(
            *fcols,
            *[F.col(f"_c_{c}").alias(c) for c in attr_cols],
        )
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Match each fact to every interval with start <= ts < end
    (half-open), via the bucketed equi join.  Timestamps and bounds
    are int64 in the same unit; ``bucket`` is the bucket width in that
    unit.  Returns facts x matched interval columns (inner join —
    unmatched facts drop; left semantics are one extra left join away).

    Exactly-once without dedup: the fact's single bucket lies in the
    interval's bucket range exactly once.
    """
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket).cast("long"),
                # end is exclusive: a bound on a bucket edge owns no
                # part of that bucket
                F.floor((F.col(end_col) - 1) / bucket).cast("long"),
            )
        ),
    )
    f = facts.withColumn(
        "_b", F.floor(F.col(ts_col) / bucket).cast("long")
    )
    out = f.join(iv, "_b").where(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("_b")
