"""Exact grouped quantiles via bounded histograms — no row sort.

The corpus-statistics op dataset cards need (length distributions per
language/stratum), done the way it survives 10^12 rows: EXACT
quantiles computed from a value histogram + cumulative counts instead
of sorting rows.  The value domain (token counts, byte lengths) is
bounded and tiny relative to the corpus, so:

- **histogram**: one (group, value) partial-aggregated shuffle —
  output is |groups| × |distinct values| rows, corpus-independent;
- **cumsum**: a window over the histogram ordered by value — partition
  sizes are the per-group distinct-value counts, never row counts;
- **quantile pick**: the smallest value whose cumulative count reaches
  ceil(q·total), evaluated as the integer comparison
  ``cum · 100 >= q · total`` — no doubles anywhere, so both engines
  agree exactly (this is the standard lower/inverted-CDF quantile).

Spark's built-in percentile_approx is engine-specific (GK sketch) and
would never hash-match an oracle; this is the exact, deterministic
alternative with the same scale envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    vals: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[int] = (25, 50, 75, 95),
) -> DataFrame:
    """-> (group, q, value): for each group and each q in percent, the
    smallest value with cum_count·100 >= q·total."""
    # underscore-prefixed internals so a caller's value column named
    # "n"/"cum"/"total" can never collide (AMBIGUOUS_REFERENCE)
    hist = vals.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_qn")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = hist.withColumn("cum", F.sum("_qn").over(w)).withColumn(
        "total", F.sum("_qn").over(wt)
    )
    spark = vals.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(int(q),) for q in qs], "q int")
    )
    return (
        cum.crossJoin(qdf)
        .where(F.col("cum") * 100 >= F.col("q") * F.col("total"))
        .groupBy(group_col, "q")
        .agg(F.min(value_col).alias("value"))
        .select(
            group_col,
            F.col("q").cast("long").alias("q"),
            F.col("value").cast("long").alias("value"),
        )
    )
