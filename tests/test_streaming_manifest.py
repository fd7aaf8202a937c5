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
    state = spark.read.parquet(f"{out_dir}/_state")
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
