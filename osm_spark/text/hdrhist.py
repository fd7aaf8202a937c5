"""HDR-histogram quantile sketch — log-bucketed, mergeable, exact-int.

Completes the sketch family (KMV distinct, HLL, Bloom, Count-Min) with
the QUANTILE sketch for unbounded value domains.  The engine's exact
grouped quantiles (text/quantiles.py) are the right tool when the
value domain is small (token counts); when values span orders of
magnitude (bytes transferred, latencies, payment amounts at 10^12
rows) the histogram domain must be compressed.  The standard sketches
(t-digest, KLL, GK) are randomized or merge-order-dependent — they can
never hash-match an oracle and two cluster runs disagree.  This is the
HdrHistogram design instead: exponential octaves with linear
sub-buckets, a PURE FUNCTION of each value.

Bucketing (3 sub-bucket bits => worst-case relative error 2^-3):

    o   = bit length of v            (the octave; v >= 1)
    sub = next 3 bits after the leading 1 (zero-padded)
    lo  = (8 + sub) * 2^(o-4)        (bucket lower bound; = v for o<=4)

so every bucket spans [lo, lo + 2^(o-4)) and width/lo <= 1/8: any rank
statistic read off the histogram lands within 12.5% of the true value,
with exactly 8 * 63 possible buckets for the whole int64 domain.

Cross-engine exactness: the bit extraction runs through binary STRINGS
(Spark ``conv(v, 10, 2)``, DuckDB ``bin(v)`` — identical no-leading-
zero representations) + substr/rpad, and the 2^k scaling uses
``pow(2, k)`` cast to int64, exact in IEEE double for every k <= 62.
No transcendental ever touches a bucket boundary (a float ``log`` here
would put values near powers of two into engine-dependent buckets).

Scale shape: ONE (group, bucket) partial-aggregated shuffle — output
is |groups| x <=504 rows regardless of corpus size; histograms merge
by cell-wise SUM (tree-aggregatable); the quantile pick is a window
over the bounded histogram, never a row sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def octave(v) -> Column:
    """Bit length of v (v >= 1) via the binary string — exact."""
    return F.length(F.conv(_c(v), 10, 2)).cast("int")


def subbucket(v) -> Column:
    """The 3 bits after the leading 1, msb-aligned (0..7) — exact."""
    b = F.conv(_c(v), 10, 2)
    return F.conv(F.rpad(F.substring(b, 2, 3), 3, "0"), 2, 10).cast("int")


def bucket_lo(o, sub) -> Column:
    """Lower bound of bucket (o, sub) — the sketch's value estimate."""
    o, sub = _c(o), _c(sub)
    base = (F.lit(8) + sub).cast("long")
    up = base * F.pow(F.lit(2.0), (o - 4).cast("double")).cast("long")
    down = F.floor(
        base / F.pow(F.lit(2.0), (F.lit(4) - o).cast("double"))
    )
    return F.when(o >= 4, up).otherwise(down).cast("long")


def bucket_lo_sql(o: str, sub: str) -> str:
    """DuckDB twin of :func:`bucket_lo` (same pow-of-two arithmetic)."""
    return (
        f"CAST(CASE WHEN {o} >= 4"
        f" THEN (8 + {sub}) * CAST(pow(2, {o} - 4) AS BIGINT)"
        f" ELSE (8 + {sub}) // CAST(pow(2, 4 - {o}) AS BIGINT)"
        f" END AS BIGINT)"
    )


def hdr_histogram(
    vals: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, value>=1) -> (group, o, sub, lo, n) — the mergeable
    sketch state, one partial-aggregated shuffle, <=504 buckets/group."""
    g = vals.select(
        _c(group_col).alias("g"),
        octave(value_col).alias("o"),
        subbucket(value_col).alias("sub"),
    )
    return (
        g.groupBy("g", "o", "sub")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("g").alias(group_col), "o", "sub",
            bucket_lo("o", "sub").alias("lo"), "n",
        )
    )


def hdr_quantiles(
    hist: DataFrame, group_col: str, qs: Sequence[int] = (50, 90, 99)
) -> DataFrame:
    """Histogram -> (group, q, est, total): est is the lower bound of
    the bucket where the cumulative count crosses ceil(q% of total) —
    the inverted-CDF pick as a pure integer comparison (cum*100 >=
    q*total), guaranteed within 12.5% below the true rank value."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("lo").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = hist.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_tot", F.sum("n").over(wt)
    )
    spark = hist.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(int(q),) for q in qs], "q int")
    )
    return (
        cum.crossJoin(qdf)
        .where(F.col("_cum") * 100 >= F.col("q") * F.col("_tot"))
        .groupBy(group_col, "q")
        .agg(
            F.min("lo").cast("long").alias("est"),
            F.max("_tot").cast("long").alias("total"),
        )
    )
