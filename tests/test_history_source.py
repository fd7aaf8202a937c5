"""HistoryDatasource facade: per-element histories, NotFound, and the
At(t) / snapshot_at(t) time-travel reads (CommittedAt fallback)."""

from datetime import datetime

from osm_spark.sources.history import HistoryDatasource


def _ds(spark):
    rows = [
        # node 1: v1 2020-01, v2 2020-06, deleted v3 2021-01
        ("node", 1, 1, True, 10, datetime(2020, 1, 1), datetime(2020, 1, 1)),
        ("node", 1, 2, True, 11, datetime(2020, 6, 1), datetime(2020, 6, 1)),
        ("node", 1, 3, False, 12, datetime(2021, 1, 1), datetime(2021, 1, 1)),
        # way 5: committed null -> CommittedAt falls back to ts
        ("way", 5, 1, True, 20, datetime(2020, 3, 1), None),
    ]
    df = spark.createDataFrame(
        rows,
        "type string, id long, version int, visible boolean, "
        "changeset long, ts timestamp, committed timestamp",
    )
    return HistoryDatasource(df)


def test_histories_and_not_found(spark):
    ds = _ds(spark)
    assert [r.version for r in ds.node_history(1).collect()] == [1, 2, 3]
    assert ds.not_found(ds.node_history(999))
    assert not ds.not_found(ds.way_history(5))


def test_at_picks_visible_version(spark):
    ds = _ds(spark)
    assert ds.at("node", 1, datetime(2020, 2, 1)).collect()[0].version == 1
    assert ds.at("node", 1, datetime(2020, 7, 1)).collect()[0].version == 2
    # after deletion -> empty
    assert ds.at("node", 1, datetime(2021, 2, 1)).count() == 0
    # before creation -> empty
    assert ds.at("node", 1, datetime(2019, 1, 1)).count() == 0
    # committed-null falls back to ts
    assert ds.at("way", 5, datetime(2020, 4, 1)).collect()[0].version == 1


def test_snapshot_at(spark):
    ds = _ds(spark)
    snap = {(r.type, r.id): r.version for r in ds.snapshot_at(datetime(2020, 7, 1)).collect()}
    assert snap == {("node", 1): 2, ("way", 5): 1}
    snap2 = {(r.type, r.id): r.version for r in ds.snapshot_at(datetime(2021, 6, 1)).collect()}
    assert snap2 == {("way", 5): 1}  # node 1 deleted by then
