"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same configs are what we would
ship to a 1000-executor cluster (AQE on, skew-join on, Arrow on). Shuffle
partition count is sized by caller (tests use 32; a real cluster would use
~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce + skew-join splitting — the first line of
        # defense against hot tiles/cells at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # timestamps: engine semantics are UTC throughout (reference uses
        # time.Time in UTC).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # A long session (the driver gate runs ~80 queries; the bench
        # ~25) generates hundreds of whole-stage-codegen classes; the
        # JVM's default 240m code cache fills, JIT compilation STOPS,
        # and late-session wide-codegen stages (md5-heavy dedup) run
        # interpreted at 5-6x the time — measured on this VM (minhash
        # 3.4s early-session vs 20s late-session, identical plan).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g "
            + os.environ.get("SPARK_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
