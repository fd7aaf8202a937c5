"""temporal/events.py TWA + funnel unit tests."""

import datetime as dt

from osm_spark.temporal import events as EV


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
        "event_type string, vq long"
    )


def test_twa_weights_by_duration_not_count(spark):
    # value 100 held 10s, then a burst of 3 samples at value 0 held 0s
    # each except the segment gaps: 100@t0..t10, 0@t10..t11, 0@t11..t12,
    # 0@t12 (last, zero hold)
    df = _ev(spark, [
        (1, _ts(0), 1, "x", 100),
        (1, _ts(10), 2, "x", 0),
        (1, _ts(11), 3, "x", 0),
        (1, _ts(12), 4, "x", 0),
    ])
    r = EV.time_weighted_avg(df, "user_id", "ts", "vq", "event_id").first()
    assert r.n_obs == 4
    assert r.total_ms == 12_000
    assert r.wsum == 100 * 10_000
    assert r.twa_q == (100 * 10_000) // 12_000  # 83, NOT mean(25)


def test_twa_single_event_reports_its_value(spark):
    df = _ev(spark, [(1, _ts(0), 1, "x", 42)])
    r = EV.time_weighted_avg(df, "user_id", "ts", "vq", "event_id").first()
    assert (r.total_ms, r.twa_q) == (0, 42)


def test_funnel_requires_stage_order(spark):
    df = _ev(spark, [
        # user 1: full ordered funnel
        (1, _ts(0), 1, "view", 0),
        (1, _ts(5), 2, "click", 0),
        (1, _ts(9), 3, "purchase", 0),
        # user 2: purchase BEFORE view -> reaches only stage 0
        (2, _ts(0), 4, "purchase", 0),
        (2, _ts(1), 5, "view", 0),
        # user 3: click only, never views -> reaches nothing
        (3, _ts(0), 6, "click", 0),
    ])
    out = {
        r.stage_idx: r
        for r in EV.funnel(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert out[0].n_reached == 2 and out[0].sum_latency_us == 0
    assert out[1].n_reached == 1
    assert out[2].n_reached == 1
    assert out[2].sum_latency_us == 9_000_000  # t9 - t0


def test_funnel_same_timestamp_is_not_after(spark):
    # click at the same instant as view: strictly-after fails
    df = _ev(spark, [
        (1, _ts(0), 1, "view", 0),
        (1, _ts(0), 2, "click", 0),
    ])
    out = {
        r.stage_idx: r.n_reached
        for r in EV.funnel(
            df, "user_id", "ts", "event_type", ["view", "click"]
        ).collect()
    }
    assert out == {0: 1, 1: 0}
