"""geo/trajectory.py (OD flows, stay points) + geo/nearest.py unit tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_spark.geo import nearest as NR
from osm_spark.geo import trajectory as TJ


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
        "cell_x long, cell_y long"
    )


# ---------------------------------------------------------------- od_flows
def test_od_flows_counts_moves_only(spark):
    df = _events(spark, [
        # user 1: A A B A  -> trips A->B, B->A
        (1, _ts(0), 1, 0, 0),
        (1, _ts(1), 2, 0, 0),
        (1, _ts(2), 3, 5, 5),
        (1, _ts(3), 4, 0, 0),
        # user 2: A B  -> trip A->B
        (2, _ts(0), 5, 0, 0),
        (2, _ts(1), 6, 5, 5),
    ])
    out = {
        (r.o_x, r.o_y, r.d_x, r.d_y): (r.n_trips, r.n_users)
        for r in TJ.od_flows(df, "user_id", ["ts", "event_id"]).collect()
    }
    assert out == {
        (0, 0, 5, 5): (2, 2),  # both users make A->B once
        (5, 5, 0, 0): (1, 1),
    }


def test_od_flows_orders_by_tiebreak_column(spark):
    # same ts: event_id breaks the tie, so the trip direction flips with it
    df = _events(spark, [
        (1, _ts(0), 2, 5, 5),
        (1, _ts(0), 1, 0, 0),
    ])
    rows = TJ.od_flows(df, "user_id", ["ts", "event_id"]).collect()
    assert [(r.o_x, r.d_x) for r in rows] == [(0, 5)]


# -------------------------------------------------------------- stay_points
def test_stay_points_islands_and_min_events(spark):
    df = _events(spark, [
        # user 1: 3 at A (stay), 1 at B (pass), 3 at A again (second stay)
        (1, _ts(0), 1, 0, 0),
        (1, _ts(1), 2, 0, 0),
        (1, _ts(2), 3, 0, 0),
        (1, _ts(3), 4, 9, 9),
        (1, _ts(4), 5, 0, 0),
        (1, _ts(5), 6, 0, 0),
        (1, _ts(7), 7, 0, 0),
    ])
    out = TJ.stay_points(
        df, "user_id", ["ts", "event_id"], "ts", min_events=3
    ).orderBy("stay_seq").collect()
    assert [(r.stay_seq, r.cell_x, r.n_events) for r in out] == [
        (1, 0, 3), (2, 0, 3),
    ]
    # same cell revisited is a NEW stay (islands, not groupBy cell)
    assert out[0].enter_ts == _ts(0) and out[0].exit_ts == _ts(2)
    assert out[0].dwell_us == 2_000_000
    assert out[1].dwell_us == 3_000_000  # ts 4..7


def test_stay_points_threshold_filters_short_runs(spark):
    df = _events(spark, [
        (1, _ts(0), 1, 0, 0),
        (1, _ts(1), 2, 0, 0),
        (1, _ts(2), 3, 1, 1),
    ])
    assert TJ.stay_points(
        df, "user_id", ["ts", "event_id"], "ts", min_events=3
    ).count() == 0


# ------------------------------------------------------------- nearest_site
def test_nearest_site_argmin_and_ties(spark):
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 100, 0), (3, 50, 0)], "pid long, px long, py long"
    )
    # sites at x=0 and x=100; x=50 is equidistant -> smaller site id wins
    out = {
        r.pid: (r.site_id, r.d2)
        for r in NR.nearest_site(
            pts, [(7, 0, 0), (3, 100, 0)], "px", "py"
        ).collect()
    }
    assert out[1] == (7, 0)
    assert out[2] == (3, 0)
    assert out[3] == (3, 2500)  # tie on d2=2500 -> site id 3 < 7


def test_nearest_site_guards():
    with pytest.raises(ValueError, match="at least one site"):
        NR.sites_array([])
    with pytest.raises(ValueError, match="overflow"):
        NR.sites_array([(1, NR.MAX_ABS_UDEG + 1, 0)])


def test_nearest_site_plan_is_scan_shaped(spark):
    """Zero joins, zero exchanges, zero Python nodes — the whole argmin
    fuses into the point-side projection."""
    pts = spark.range(10).select(
        F.col("id").alias("pid"),
        (F.col("id") * 1000).alias("px"),
        (F.col("id") * 7).alias("py"),
    )
    plan = NR.nearest_site(
        pts, [(k, k * 11, k * 13) for k in range(16)], "px", "py"
    )._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                 "MapInPandas"):
        assert node not in plan, plan
