"""text/hdrhist.py HDR quantile sketch unit tests."""

import random

from pyspark.sql import functions as F

from osm_spark.text import hdrhist as HH


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_bucket_function_exact_small_values(spark):
    # o <= 4: every value is its own bucket and lo == value
    df = spark.range(1, 17).select(F.col("id").alias("v"))
    rows = df.select(
        "v",
        HH.octave("v").alias("o"),
        HH.subbucket("v").alias("sub"),
    ).select("v", HH.bucket_lo("o", "sub").alias("lo")).collect()
    assert all(r.lo == r.v for r in rows)


def test_bucket_bounds_and_width(spark):
    # every value sits in [lo, lo + lo/8] for o > 4 (12.5% width)
    vals = [17, 100, 1000, 12345, 999_999, 2**40 + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v", HH.octave("v").alias("o"), HH.subbucket("v").alias("sub")
    ).select("v", HH.bucket_lo("o", "sub").alias("lo")).collect()
    for r in rows:
        assert r.lo <= r.v, r
        assert r.v - r.lo <= r.lo // 8, r


def test_histograms_merge_by_cell_sum(spark):
    rng = random.Random(3)
    a = [("x", rng.randrange(1, 10**6)) for _ in range(300)]
    b = [("x", rng.randrange(1, 10**6)) for _ in range(300)]
    h_union = HH.hdr_histogram(_vals(spark, a + b), "g", "v")
    merged = (
        HH.hdr_histogram(_vals(spark, a), "g", "v")
        .unionAll(HH.hdr_histogram(_vals(spark, b), "g", "v"))
        .groupBy("g", "o", "sub", "lo")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    assert sorted(map(tuple, h_union.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_quantile_estimates_within_error_bound(spark):
    rng = random.Random(11)
    data = [("g", rng.randrange(1, 10**7)) for _ in range(2000)]
    hist = HH.hdr_histogram(_vals(spark, data), "g", "v")
    out = {r.q: r for r in HH.hdr_quantiles(hist, "g", (50, 90, 99)).collect()}
    xs = sorted(v for _, v in data)
    for q in (50, 90, 99):
        # the inverted-CDF rank the sketch targets
        import math
        true = xs[math.ceil(q / 100 * len(xs)) - 1]
        est = out[q].est
        # est is a bucket LOWER bound containing a value >= true rank's
        # bucket: within 12.5% below, never above the bucket ceiling
        assert est <= true
        assert true - est <= est // 8 + 1, (q, est, true)
        assert out[q].total == len(xs)
