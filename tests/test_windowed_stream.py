"""Watermarked tumbling-window aggregation: late data beyond the
watermark is dropped; data within it still lands in its event-time
window (the streaming surface SURVEY §2.9 maps the replication
minutely/hourly cadence onto)."""

import os
from datetime import datetime

from pyspark.sql import functions as F


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema("ts timestamp, v long").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # batch 1: events in the 10:00 and 11:00 windows; max ts 11:30
    spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 10, 5), 1),
            (datetime(2024, 1, 1, 10, 50), 2),
            (datetime(2024, 1, 1, 11, 30), 3),
        ],
        "ts timestamp, v long",
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    # batch 2: watermark is now 11:20; a 10:15 event is LATE (dropped),
    # an 11:15 event is within the window-retention and still counts
    spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 10, 15), 4),   # late -> dropped
            (datetime(2024, 1, 1, 11, 15), 5),   # accepted
            (datetime(2024, 1, 1, 12, 1), 6),    # new window
        ],
        "ts timestamp, v long",
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        key = r["w_start"]
        latest[key] = max(latest.get(key, 0), r["n"])
    assert latest[datetime(2024, 1, 1, 10, 0)] == 2   # late row NOT added
    assert latest[datetime(2024, 1, 1, 11, 0)] == 2   # 11:30 + 11:15
    assert latest[datetime(2024, 1, 1, 12, 0)] == 1
