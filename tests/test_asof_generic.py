"""temporal/asof.py generic as-of + interval join unit tests."""

import datetime as dt

from osm_spark.temporal import asof as AS


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fid long, k long, ts timestamp")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, price long")


def test_asof_picks_latest_at_or_before(spark):
    f = _facts(spark, [(1, 7, _ts(10)), (2, 7, _ts(25)), (3, 7, _ts(4))])
    d = _dim(spark, [(7, _ts(5), 100), (7, _ts(20), 200)])
    out = {r.fid: r.price for r in
           AS.asof_join(f, d, "k", "ts", ["price"]).collect()}
    assert out == {1: 100, 2: 200, 3: None}  # fid 3 precedes all dims


def test_asof_equal_ts_is_visible_unless_strict(spark):
    f = _facts(spark, [(1, 7, _ts(5))])
    d = _dim(spark, [(7, _ts(5), 100)])
    at = AS.asof_join(f, d, "k", "ts", ["price"]).first().price
    st = AS.asof_join(f, d, "k", "ts", ["price"], strict=True).first().price
    assert at == 100 and st is None


def test_asof_keys_are_independent(spark):
    f = _facts(spark, [(1, 1, _ts(10)), (2, 2, _ts(10))])
    d = _dim(spark, [(1, _ts(5), 111), (2, _ts(5), 222)])
    out = {r.fid: r.price for r in
           AS.asof_join(f, d, "k", "ts", ["price"]).collect()}
    assert out == {1: 111, 2: 222}


def test_asof_plan_has_no_join_node(spark):
    f = _facts(spark, [(1, 1, _ts(10))])
    d = _dim(spark, [(1, _ts(5), 1)])
    plan = AS.asof_join(f, d, "k", "ts", ["price"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def _iv(spark, rows):
    return spark.createDataFrame(rows, "iv long, s long, e long")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, t long")


def test_interval_join_half_open_and_overlap(spark):
    iv = _iv(spark, [(1, 100, 200), (2, 150, 300)])
    pts = _pts(spark, [(1, 100), (2, 199), (3, 200), (4, 160), (5, 50)])
    out = AS.interval_join(pts, iv, "t", "s", "e", bucket=64)
    got = sorted((r.pid, r.iv) for r in out.collect())
    # t=100 in [100,200) only; t=199 in both? 199 in [150,300) too
    # t=200 excluded from iv1 (half-open), in iv2; t=160 in both
    assert got == [(1, 1), (2, 1), (2, 2), (3, 2), (4, 1), (4, 2)]


def test_interval_join_exactly_once_across_buckets(spark):
    # interval spans many buckets; each contained fact matches ONCE
    iv = _iv(spark, [(1, 0, 1000)])
    pts = _pts(spark, [(i, i * 97 % 1000) for i in range(40)])
    out = AS.interval_join(pts, iv, "t", "s", "e", bucket=64)
    assert out.count() == 40


def test_interval_end_on_bucket_edge_owns_nothing_past(spark):
    # end exactly on a bucket boundary must not claim that bucket
    iv = _iv(spark, [(1, 0, 64)])
    pts = _pts(spark, [(1, 63), (2, 64)])
    got = [r.pid for r in
           AS.interval_join(pts, iv, "t", "s", "e", bucket=64).collect()]
    assert got == [1]
