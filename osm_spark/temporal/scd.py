"""SCD Type-2 dimension build — change streams to validity intervals.

The reference's element model IS slowly-changing-dimension data:
every node/way version carries (id, version, timestamp, visible) and
consumers ask "which version was current at time t" (annotate's
FindVisible, history.snapshot_at — reference annotate/types.go:39-110
semantics).  This module generalizes the pattern every warehouse
needs: turn an attribute-change stream (key, ts, attr) into interval
rows (key, attr, valid_from, valid_to, version_seq, is_current),
COLLAPSING no-op updates — a recrawl that observes the same value
must extend the current interval, not open a new version, or the
dimension bloats by the recrawl rate instead of the change rate.

Shape: gaps-and-islands over ONE key-ordered window (change flag ->
running island id -> per-island min/max) + one lead() for the
interval close — two window passes over the SAME key partitioning,
so Spark plans a single exchange; integer epoch-micros boundaries,
half-open [from, to) with NULL/open current intervals surfaced as
is_current.  Zero Python, zero joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_us",
    attr_col: str = "attr",
) -> DataFrame:
    """-> (key, attr, valid_from_us, valid_to_us, version_seq,
    is_current); ``valid_to_us`` is -1 on the open interval.  Ties on
    (key, ts) must be pre-collapsed upstream (one observation per
    key+ts)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    flagged = changes.select(
        key_col, ts_col, attr_col,
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            1,
        ).otherwise(0).alias("__chg"),
    ).withColumn(
        "__island",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    grp = flagged.groupBy(key_col, "__island").agg(
        F.first(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from_us"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from_us")
    return grp.select(
        key_col,
        attr_col,
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.coalesce(
            F.lead("valid_from_us").over(w2), F.lit(-1)
        ).cast("long").alias("valid_to_us"),
        (F.row_number().over(w2)).cast("long").alias("version_seq"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )
