"""Per-stage lineage + metrics manifest with snapshot resume.

North-rule requirement: every stage writes per-partition lineage and
row-count metrics to a checkpoint manifest so a failed run resumes from
the last committed snapshot. Iceberg is the production target; in this
sandbox the same contract is realized over parquet directories with an
atomic JSON commit marker per stage (the Iceberg snapshot analog):

    <root>/<stage>/data/...parquet        -- stage output
    <root>/<stage>/manifest.json          -- committed atomically (rename)

manifest.json records stage name, input fingerprint, per-partition row
counts, total rows, and wall time. ``run_stage`` skips any stage whose
manifest already matches the input fingerprint — that IS the resume
path: a rerun after a crash recomputes only uncommitted stages.

Per-partition counts come from ``spark_partition_id()`` groupBy — one
extra cheap aggregation per stage, no mapPartitions counters needed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_counts(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [{"partition": int(r.pid), "rows": int(r["count"])} for r in rows]


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "manifest.json")


def load_manifest(root: str, stage: str) -> dict | None:
    p = _manifest_path(root, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def commit_manifest(root: str, stage: str, manifest: dict) -> None:
    """Atomic commit: write sidecar then rename — the crash-consistency
    contract (a stage without manifest.json is uncommitted)."""
    os.makedirs(os.path.join(root, stage), exist_ok=True)
    tmp = _manifest_path(root, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(root, stage))


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    input_fingerprint: str,
    build,  # Callable[[], DataFrame]
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Execute (or resume-skip) one pipeline stage.

    If a committed manifest exists for the same input fingerprint the
    stage is skipped and its parquet output is returned (resume from
    last committed snapshot). Otherwise the stage runs, writes parquet,
    collects per-partition lineage counts, and commits the manifest
    LAST — so a crash anywhere leaves the stage uncommitted and a rerun
    redoes it.
    """
    data_dir = os.path.join(root, stage, "data")
    existing = load_manifest(root, stage)
    if existing is not None and existing.get("input_fingerprint") == input_fingerprint:
        return spark.read.parquet(data_dir)

    t0 = time.time()
    df = build()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    out = spark.read.parquet(data_dir)
    counts = partition_counts(out)
    commit_manifest(
        root,
        stage,
        {
            "stage": stage,
            "input_fingerprint": input_fingerprint,
            "partitions": counts,
            "total_rows": sum(c["rows"] for c in counts),
            "wall_sec": round(time.time() - t0, 3),
            "committed_at_unix": int(time.time()),
        },
    )
    return out
