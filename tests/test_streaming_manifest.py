"""Streaming replication kernel + lineage manifest/resume tests."""

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _changes(spark, rows):
    from osm_spark.streaming.replication import CHANGE_SCHEMA

    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_apply_change_batch_create_modify_delete(spark):
    from osm_spark.streaming.replication import apply_change_batch

    state = _changes(
        spark,
        [(0, "create", "node", 1, 1, True, 10, datetime(2024, 1, 1), 1.0, 2.0)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")

    batch = _changes(
        spark,
        [
            # modify existing node 1
            (5, "modify", "node", 1, 2, True, 11, datetime(2024, 1, 2), 1.0, 3.0),
            # create new node 2
            (5, "create", "node", 2, 1, True, 11, datetime(2024, 1, 2), 5.0, 5.0),
            # delete node 3 that has no history -> still delete action
            (5, "delete", "node", 3, 2, False, 11, datetime(2024, 1, 2), 0.0, 0.0),
            # modify node 4 with no history -> degrades to create
            (5, "modify", "node", 4, 1, True, 11, datetime(2024, 1, 2), 6.0, 6.0),
        ],
    )
    actions, new_state = apply_change_batch(state, batch)
    amap = {r.id: r for r in actions.collect()}
    assert amap[1].action == "modify" and amap[1].old_version == 1
    assert amap[2].action == "create" and amap[2].old_version is None
    assert amap[3].action == "delete"
    assert amap[4].action == "create"

    smap = {r.id: r for r in new_state.collect()}
    assert smap[1].version == 2 and smap[1].lon == 3.0
    assert smap[3].visible is False
    assert len(smap) == 4


def test_apply_change_batch_multiple_versions_in_one_batch(spark):
    """Within-batch ordering: second version's old = first version."""
    from osm_spark.streaming.replication import apply_change_batch

    state = _changes(spark, []).select(
        "type", "id", "version", "visible", "changeset", "ts", "lat", "lon"
    )
    batch = _changes(
        spark,
        [
            (7, "create", "node", 1, 1, True, 20, datetime(2024, 2, 1), 0.0, 0.0),
            (7, "modify", "node", 1, 2, True, 20, datetime(2024, 2, 1, 0, 5), 0.0, 1.0),
        ],
    )
    actions, new_state = apply_change_batch(state, batch)
    a = {(r.id, r.new_version): r for r in actions.collect()}
    assert a[(1, 1)].action == "create" and a[(1, 1)].old_version is None
    assert a[(1, 2)].action == "modify" and a[(1, 2)].old_version == 1
    assert new_state.collect()[0].version == 2


def test_streaming_end_to_end(spark, tmp_path):
    """Micro-batch stream via foreachBatch: actions land, state advances."""
    from osm_spark.streaming.replication import CHANGE_SCHEMA, stream_changes

    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    batch = _changes(
        spark,
        [
            (1, "create", "node", 1, 1, True, 10, datetime(2024, 1, 1), 1.0, 1.0),
            (1, "create", "node", 2, 1, True, 10, datetime(2024, 1, 1), 2.0, 2.0),
        ],
    )
    batch.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(src_dir)
    empty_state = _changes(spark, []).select(
        "type", "id", "version", "visible", "changeset", "ts", "lat", "lon"
    )
    out_dir = str(tmp_path / "out")
    q = stream_changes(
        spark, stream, empty_state, str(tmp_path / "ckpt"), out_dir
    ).start()
    q.awaitTermination(120)

    actions = spark.read.parquet(f"{out_dir}/actions")
    assert actions.count() == 2
    assert {r.action for r in actions.collect()} == {"create"}
    from osm_spark.streaming.replication import read_state

    state = read_state(spark, out_dir)
    assert state.count() == 2


def test_manifest_resume(spark, tmp_path):
    from osm_spark.pipeline import manifest as M

    root = str(tmp_path / "pipe")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    out1 = M.run_stage(spark, root, "stage1", "fp-v1", build)
    assert out1.count() == 100
    assert calls["n"] == 1

    m = M.load_manifest(root, "stage1")
    assert m["total_rows"] == 100
    assert sum(p["rows"] for p in m["partitions"]) == 100
    assert m["input_fingerprint"] == "fp-v1"

    # same fingerprint -> resume (no rebuild)
    out2 = M.run_stage(spark, root, "stage1", "fp-v1", build)
    assert calls["n"] == 1
    assert out2.count() == 100

    # changed input -> stage reruns
    M.run_stage(spark, root, "stage1", "fp-v2", build)
    assert calls["n"] == 2


def test_manifest_crash_leaves_uncommitted(spark, tmp_path):
    """A build that dies after writing data but before commit must rerun."""
    from osm_spark.pipeline import manifest as M

    root = str(tmp_path / "pipe2")

    class Boom(Exception):
        pass

    def bad_build():
        df = spark.range(10)
        df.write.mode("overwrite").parquet(os.path.join(root, "s", "data"))
        raise Boom()

    with pytest.raises(Boom):
        M.run_stage(spark, root, "s", "fp", bad_build)
    assert M.load_manifest(root, "s") is None

    ok = M.run_stage(spark, root, "s", "fp", lambda: spark.range(10))
    assert ok.count() == 10
    assert M.load_manifest(root, "s")["total_rows"] == 10


def test_bucketed_state_store_partial_rewrite(spark, tmp_path):
    """Only touched buckets gain a new epoch; untouched pointers stay."""
    from osm_spark.streaming.replication import latest_state
    from osm_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st"), n_buckets=8)
    init = _changes(
        spark,
        [
            (0, "create", "node", i, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0)
            for i in range(40)
        ],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.init(init)
    before = store.pointer()

    batch = _changes(
        spark,
        [(1, "modify", "node", 3, 2, True, 11, datetime(2024, 1, 2), 9.0, 9.0)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.apply(batch, latest_state)
    after = store.pointer()

    assert after["epoch"] == before["epoch"] + 1
    changed = {
        b for b in after["buckets"] if after["buckets"][b] != before["buckets"].get(b)
    }
    assert len(changed) == 1  # exactly the bucket id 3 hashes into
    st = store.read()
    assert st.count() == 40
    assert st.filter("id = 3").collect()[0].version == 2


def test_bucketed_state_store_crash_before_commit(spark, tmp_path):
    """A crash AFTER writing epoch data but BEFORE the pointer rename
    leaves the previous committed state fully visible; redoing the
    batch converges."""
    from osm_spark.streaming.replication import latest_state
    from osm_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st2"), n_buckets=4)
    init = _changes(
        spark,
        [(0, "create", "node", i, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0)
         for i in range(10)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.init(init)

    batch = _changes(
        spark,
        [(1, "modify", "node", 5, 2, True, 11, datetime(2024, 1, 2), 7.0, 7.0)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")

    class Boom(Exception):
        pass

    real_commit = store._commit_pointer

    def crash(ptr):
        raise Boom()

    store._commit_pointer = crash
    with pytest.raises(Boom):
        store.apply(batch, latest_state)

    # state still the old committed version (epoch data exists on disk
    # but nothing references it)
    fresh = BucketedStateStore(spark, str(tmp_path / "st2"), n_buckets=4)
    assert fresh.pointer()["epoch"] == 0
    assert fresh.read().filter("id = 5").collect()[0].version == 1

    # redo the batch (Spark would replay it from the checkpoint); the
    # redo REUSES the orphaned epoch dir (mode=overwrite) then commits
    fresh.apply(batch, latest_state)
    assert fresh.read().filter("id = 5").collect()[0].version == 2
    assert fresh.read().count() == 10

    # everything on disk is referenced -> gc removes nothing
    assert fresh.gc() == []

    # a further batch on the same key supersedes epoch 1's only bucket;
    # time travel still sees each committed epoch until history expires
    batch2 = batch.withColumn("version", F.lit(3))
    fresh.apply(batch2, latest_state)
    assert fresh.read(epoch=1).filter("id = 5").collect()[0].version == 2
    assert fresh.read(epoch=0).filter("id = 5").collect()[0].version == 1
    assert fresh.gc() == []  # history keeps old epochs alive
    removed = fresh.gc(expire_history=True)
    assert any("epoch=1" in d for d in removed)
    assert fresh.read().count() == 10
    assert fresh.read().filter("id = 5").collect()[0].version == 3
    with pytest.raises(ValueError):
        fresh.read(epoch=1)


def test_bucketed_state_store_bucket_delete(spark, tmp_path):
    """A merge that deletes EVERY key in a touched bucket drops that
    bucket's pointer (instead of inheriting the previous epoch's path,
    which would resurrect the deleted keys on the next read)."""
    from pyspark.sql import functions as F

    from osm_spark.streaming.replication import latest_state
    from osm_spark.streaming.state_store import BucketedStateStore

    store = BucketedStateStore(spark, str(tmp_path / "st3"), n_buckets=4)
    init = _changes(
        spark,
        [(0, "create", "node", i, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0)
         for i in range(12)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.init(init)

    # find every id living in id-3's bucket and delete exactly those
    bucket_of_3 = store.read().withColumn("_b", store.bucket_col())
    b3 = bucket_of_3.filter("id = 3").collect()[0]["_b"]
    victims = [
        r["id"] for r in bucket_of_3.filter(F.col("_b") == b3).collect()
    ]
    batch = _changes(
        spark,
        [(1, "delete", "node", i, 2, True, 11, datetime(2024, 1, 2), 0.0, 0.0)
         for i in victims],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")

    def delete_merge(df):
        # keywise merge that drops every key present in the batch twice
        # (i.e. returns zero rows for fully-deleted buckets)
        latest = latest_state(df)
        return latest.filter(F.col("version") < 2)

    store.apply(batch, delete_merge)
    after = store.read()
    assert after.count() == 12 - len(victims)
    assert after.filter(F.col("id").isin(victims)).count() == 0
    assert str(b3) not in store.pointer()["buckets"]


def test_version_as_of_sql(spark, tmp_path):
    """Iceberg-dialect `VERSION AS OF` over the store's epoch history:
    the same query text reads historical and head snapshots."""
    from osm_spark.streaming.replication import latest_state
    from osm_spark.streaming.state_store import (
        BucketedStateStore, time_travel_sql,
    )

    store = BucketedStateStore(spark, str(tmp_path / "tt"), n_buckets=4)
    init = _changes(
        spark,
        [(0, "create", "node", i, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0)
         for i in range(6)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.init(init)
    batch = _changes(
        spark,
        [(1, "modify", "node", 2, 2, True, 11, datetime(2024, 1, 2), 5.0, 5.0)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.apply(batch, latest_state)

    v0 = time_travel_sql(
        spark,
        "SELECT max(version) AS v FROM state VERSION AS OF 0 WHERE id = 2",
        {"state": store},
    ).collect()[0].v
    vh = time_travel_sql(
        spark, "SELECT max(version) AS v FROM state WHERE id = 2",
        {"state": store},
    ).collect()[0].v
    both = time_travel_sql(
        spark,
        "SELECT (SELECT count(*) FROM state VERSION AS OF 0)"
        " = (SELECT count(*) FROM state) AS same",
        {"state": store},
    ).collect()[0].same
    assert (v0, vh, both) == (1, 2, True)


def test_version_as_of_sql_ignores_non_table_occurrences(spark, tmp_path):
    """The bare-name head rewrite binds only table positions (after
    FROM/JOIN): a string literal or aliased column named like the store
    must pass through untouched (round-3 ADVICE)."""
    from osm_spark.streaming.replication import latest_state
    from osm_spark.streaming.state_store import (
        BucketedStateStore, time_travel_sql,
    )

    store = BucketedStateStore(spark, str(tmp_path / "tt2"), n_buckets=2)
    init = _changes(
        spark,
        [(0, "create", "node", i, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0)
         for i in range(3)],
    ).select("type", "id", "version", "visible", "changeset", "ts", "lat", "lon")
    store.init(init)

    row = time_travel_sql(
        spark,
        "SELECT 'state' AS lit, s.state, count(*) AS n FROM ("
        "  SELECT id AS state FROM state"
        ") s GROUP BY s.state ORDER BY s.state LIMIT 1",
        {"state": store},
    ).collect()[0]
    assert row.lit == "state"   # literal untouched
    assert row.state == 0       # column named `state` untouched
    assert row.n == 1
