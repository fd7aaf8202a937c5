"""applyInPandasWithState: engine-managed per-key state accumulates
across micro-batches AND across query restarts (checkpoint restore)."""

import os
from datetime import datetime


def _write_batch(spark, src_dir, rows, name):
    from osm_spark.streaming.replication import CHANGE_SCHEMA

    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def _run_available(spark, src_dir, ckpt, out_dir):
    # foreachBatch sink: supports checkpoint RECOVERY (the memory sink
    # does not), which is the property under test
    from osm_spark.streaming.replication import CHANGE_SCHEMA
    from osm_spark.streaming.stateful import running_element_stats

    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(src_dir)
    out = running_element_stats(stream)

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_batch(
        spark,
        src,
        [
            (1, "modify", "node", 1, 1, True, 10, datetime(2024, 1, 1), 0.0, 0.0),
            (1, "modify", "node", 1, 2, True, 10, datetime(2024, 1, 1), 0.0, 0.0),
            (1, "modify", "way", 7, 5, True, 10, datetime(2024, 1, 1), 0.0, 0.0),
        ],
        "b1",
    )
    out1 = _run_available(spark, src, ckpt, str(tmp_path / "out1"))
    got = {
        (r["type"], r["id"]): (r["n_updates"], r["max_version"])
        for r in out1.collect()
    }
    assert got[("node", 1)] == (2, 2)
    assert got[("way", 7)] == (1, 5)

    # restart with a second batch: state restored from the checkpoint,
    # counters continue from (2, 2) / (1, 5)
    _write_batch(
        spark,
        src,
        [
            (2, "modify", "node", 1, 3, True, 11, datetime(2024, 1, 2), 0.0, 0.0),
            (2, "create", "node", 9, 1, True, 11, datetime(2024, 1, 2), 0.0, 0.0),
        ],
        "b2",
    )
    out2 = _run_available(spark, src, ckpt, str(tmp_path / "out2"))
    got2 = {
        (r["type"], r["id"]): (r["n_updates"], r["max_version"])
        for r in out2.collect()
    }
    assert got2[("node", 1)] == (3, 3)  # accumulated, not restarted at 1
    assert got2[("node", 9)] == (1, 1)
    # way 7 had no updates in batch 2 -> not re-emitted in update mode
    assert ("way", 7) not in got2
