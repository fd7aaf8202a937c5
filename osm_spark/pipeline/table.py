"""Snapshot table with file-level column stats and scan pruning — the
Iceberg-shaped storage layer (north rule: "Iceberg table of
Common-Crawl-style web pages ... resumable from checkpoint").

What Iceberg actually buys at 100 TB is METADATA-scale scan planning:
a snapshot points at manifests, manifests carry per-file column
min/max bounds, and a filtered scan prunes files before any data I/O.
This module realizes that contract over plain parquet + JSON in a
PySpark-only sandbox (a real catalog is a deployment concern, not an
algorithmic one — the layout below maps 1:1 onto Iceberg concepts):

    <root>/data/snap-<id>/part-*.parquet     -- immutable data files
    <root>/metadata/manifest-<id>.json       -- per-file stats for the
                                                files ADDED by snapshot
                                                <id> (an Iceberg
                                                manifest file)
    <root>/snapshots.json                    -- snapshot log: id,
                                                parent id, timestamp,
                                                operation, schema,
                                                manifest list (the
                                                table-metadata file),
                                                committed atomically by
                                                sidecar-write + rename

Supported surface:
- append(df):     new snapshot = parent's manifests + one new manifest
- overwrite(df):  new snapshot = exactly one new manifest
- scan(...):      file pruning on column bounds BEFORE spark.read —
                  predicates that bound a stats column skip every data
                  file whose [min, max] interval can't match
- snapshot_at(ts) / scan(snapshot_id=...): time travel by timestamp or
                  snapshot id over the parent-linked log
- schema evolution: appends may ADD columns (old files read as NULL via
                  explicit projection); dropping/retyping raises
- expire_snapshots(keep_last): trims the log, gc() deletes
                  unreferenced data/manifest files

Per-file stats come from ONE aggregation over the newly written files
only (group by input file name) — O(|new data|), never O(|table|); a
production writer would lift them from parquet footers instead, the
manifest contract is identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str,
                 stats_cols: tuple[str, ...] = ()):
        self.spark = spark
        self.root = root
        self.stats_cols = list(stats_cols)
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    # ------------------------------------------------------------- log
    @property
    def _log_path(self) -> str:
        return os.path.join(self.root, "snapshots.json")

    def log(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def current(self) -> dict | None:
        log = self.log()
        return log[-1] if log else None

    # ----------------------------------------------------------- write
    def _collect_manifest(self, snap_dir: str, schema_cols) -> dict:
        """Per-file rows + min/max bounds for stats_cols, from one
        aggregation over the files just written."""
        df = self.spark.read.parquet(snap_dir)
        aggs = [F.count("*").alias("__rows")]
        for c in self.stats_cols:
            if c in schema_cols:
                aggs += [F.min(c).alias(f"__min_{c}"),
                         F.max(c).alias(f"__max_{c}")]
        rows = (
            df.groupBy(F.input_file_name().alias("__file"))
            .agg(*aggs)
            .collect()
        )
        files = []
        for r in rows:
            entry = {
                "path": r["__file"].removeprefix("file://"),
                "rows": r["__rows"],
                "bounds": {},
            }
            for c in self.stats_cols:
                if f"__min_{c}" in r.__fields__:
                    lo, hi = r[f"__min_{c}"], r[f"__max_{c}"]
                    if hasattr(lo, "isoformat"):
                        lo, hi = lo.isoformat(), hi.isoformat()
                    entry["bounds"][c] = [lo, hi]
            files.append(entry)
        return {"files": files, "rows": sum(f["rows"] for f in files)}

    def _commit(self, df: DataFrame, operation: str,
                carried_files: list[dict] | None = None) -> dict:
        parent = self.current()
        snap_id = (parent["id"] + 1) if parent else 0
        snap_dir = os.path.join(self.root, "data", f"snap-{snap_id}")
        df.write.mode("error").parquet(snap_dir)

        schema_cols = [f.name for f in df.schema.fields]
        if parent and operation == "append":
            missing = [c for c in parent["schema"] if c not in schema_cols]
            if missing:
                raise ValueError(
                    "schema evolution supports ADDING columns only; "
                    f"append drops {missing}"
                )
        manifest = self._collect_manifest(snap_dir, schema_cols)
        if carried_files:
            # COW merge: untouched parent data files survive into the
            # new snapshot's manifest verbatim (their parquet is shared
            # on disk — exactly Iceberg's file reuse)
            manifest["files"] = carried_files + manifest["files"]
            manifest["rows"] = sum(f["rows"] for f in manifest["files"])
        mpath = os.path.join(
            self.root, "metadata", f"manifest-{snap_id}.json"
        )
        _atomic_write_json(mpath, manifest)

        manifests = [f"manifest-{snap_id}.json"]
        if parent and operation == "append":
            manifests = parent["manifests"] + manifests
        snap = {
            "id": snap_id,
            "parent": parent["id"] if parent else None,
            "ts": time.time(),
            "operation": operation,
            "schema": schema_cols,
            "manifests": manifests,
        }
        log = self.log() + [snap]
        _atomic_write_json(self._log_path, log)
        return snap

    def append(self, df: DataFrame) -> dict:
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> dict:
        return self._commit(df, "overwrite")

    def merge_upsert(self, updates: DataFrame, key_col: str) -> dict:
        """Copy-on-write MERGE (Iceberg MERGE INTO semantics, COW
        strategy): rows in ``updates`` REPLACE same-key rows, new keys
        INSERT.  ``updates`` must carry the full table schema and at
        most one row per key (last-writer semantics across duplicate
        update keys are undefined — dedupe upstream).

        File-level pruning is the scale story: only parent data files
        whose ``key_col`` manifest bounds OVERLAP the updates' key
        range are read + rewritten (their survivors anti-join the
        update keys, then union the updates); every other file carries
        into the new snapshot's manifest verbatim, zero I/O — at
        10^12 rows a point-update rewrites one file, not the table.
        Files without bounds for ``key_col`` always rewrite (unknown =
        conservative, the inverse of scan pruning's unknown = keep:
        both directions must preserve correctness).  Works with
        numeric/string keys (manifest bounds for timestamps are stored
        as isoformat strings — use a primitive key column).
        """
        parent = self.current()
        if parent is None:
            return self._commit(updates, "merge")
        schema = parent["schema"]
        up_cols = [f.name for f in updates.schema.fields]
        if sorted(up_cols) != sorted(schema):
            raise ValueError(
                f"merge updates schema {sorted(up_cols)} must equal "
                f"table schema {sorted(schema)}"
            )
        b = updates.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        if b["lo"] is None:  # empty update set: nothing to commit
            return parent
        # per-FILE membership pruning, not global-range overlap: a
        # single far-away insert key would otherwise stretch the range
        # across every file and defeat pruning entirely.  The file
        # bounds table is manifest-sized (parameter-sized) — broadcast
        # it against the update keys, one job, and collect only the
        # touched file indices.
        files = self._manifest_files(parent)
        bounded = [
            (i, fe["bounds"][key_col][0], fe["bounds"][key_col][1])
            for i, fe in enumerate(files)
            if fe["bounds"].get(key_col) is not None
        ]
        touched_idx = {
            i for i, fe in enumerate(files)
            if fe["bounds"].get(key_col) is None  # unknown = rewrite
        }
        if bounded:
            bdf = self.spark.createDataFrame(
                bounded, ["__idx", "__lo", "__hi"]
            )
            k = updates.select(F.col(key_col).alias("__k"))
            hit = k.join(
                F.broadcast(bdf),
                (F.col("__k") >= F.col("__lo"))
                & (F.col("__k") <= F.col("__hi")),
            )
            touched_idx |= {
                r["__idx"] for r in hit.select("__idx").distinct().collect()
            }
        touched = [fe for i, fe in enumerate(files) if i in touched_idx]
        carried = [fe for i, fe in enumerate(files) if i not in touched_idx]
        updates = updates.select(*schema)
        if touched:
            old = self.spark.read.parquet(
                *[fe["path"] for fe in touched]
            ).select(*schema)
            keep = old.join(
                updates.select(F.col(key_col).alias("__k")),
                old[key_col] == F.col("__k"),
                "left_anti",
            )
            merged = keep.unionByName(updates)
        else:
            merged = updates
        return self._commit(merged, "merge", carried_files=carried)

    # ------------------------------------------------------------ read
    def _resolve(self, snapshot_id: int | None, as_of_ts: float | None) -> dict:
        log = self.log()
        if not log:
            raise ValueError(f"empty table at {self.root}")
        if snapshot_id is not None:
            for s in log:
                if s["id"] == snapshot_id:
                    return s
            raise ValueError(f"no snapshot {snapshot_id}")
        if as_of_ts is not None:
            eligible = [s for s in log if s["ts"] <= as_of_ts]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_ts}")
            return eligible[-1]
        return log[-1]

    def _manifest_files(self, snap: dict) -> list[dict]:
        files = []
        for m in snap["manifests"]:
            with open(os.path.join(self.root, "metadata", m)) as f:
                files.extend(json.load(f)["files"])
        return files

    def plan_files(
        self,
        predicates: list[tuple[str, str, object]] | None = None,
        snapshot_id: int | None = None,
        as_of_ts: float | None = None,
    ) -> list[dict]:
        """Scan planning: file entries surviving stats pruning.

        predicates: [(col, op, value)] with op in <, <=, >, >=, =.
        A file is pruned when its [min, max] bounds for ``col`` prove
        the predicate can never hold; files without bounds for the
        column always survive (unknown = keep, Iceberg's contract)."""
        snap = self._resolve(snapshot_id, as_of_ts)
        files = self._manifest_files(snap)
        for col, op, val in predicates or []:
            keep = []
            for fe in files:
                b = fe["bounds"].get(col)
                if b is None:
                    keep.append(fe)
                    continue
                lo, hi = b
                alive = {
                    "<": lo < val,
                    "<=": lo <= val,
                    ">": hi > val,
                    ">=": hi >= val,
                    "=": lo <= val <= hi,
                }[op]
                if alive:
                    keep.append(fe)
            files = keep
        return files

    def scan(
        self,
        predicates: list[tuple[str, str, object]] | None = None,
        snapshot_id: int | None = None,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """Pruned read. The predicate ALSO applies row-level (pruning
        is a superset cut, exactly like Iceberg planning + Spark
        filter); reading an old snapshot whose schema was narrower
        projects the snapshot's schema (added-later columns absent)."""
        snap = self._resolve(snapshot_id, as_of_ts)
        files = self.plan_files(predicates, snapshot_id=snap["id"])
        if not files:
            # schema-stable empty frame
            head = self.spark.read.parquet(
                os.path.join(self.root, "data", f"snap-{snap['id']}")
            )
            return head.where(F.lit(False)).select(*snap["schema"])
        df = self.spark.read.option("mergeSchema", "true").parquet(
            *[fe["path"] for fe in files]
        )
        for c in snap["schema"]:
            if c not in df.columns:  # file set pruned to pre-evolution files
                df = df.withColumn(c, F.lit(None))
        df = df.select(*snap["schema"])
        for col, op, val in predicates or []:
            df = df.where(
                {
                    "<": F.col(col) < val,
                    "<=": F.col(col) <= val,
                    ">": F.col(col) > val,
                    ">=": F.col(col) >= val,
                    "=": F.col(col) == val,
                }[op]
            )
        return df

    def snapshot_at(self, ts: float) -> DataFrame:
        """TIMESTAMP AS OF twin of scan(snapshot_id=...)."""
        return self.scan(as_of_ts=ts)

    # --------------------------------------------------------- expiry
    def expire_snapshots(self, keep_last: int) -> list[int]:
        """Trim the log to the newest ``keep_last`` snapshots (the
        head stays reachable; parent links of survivors are preserved
        in the entries themselves)."""
        log = self.log()
        if len(log) <= keep_last:
            return []
        dropped = [s["id"] for s in log[:-keep_last]]
        _atomic_write_json(self._log_path, log[-keep_last:])
        return dropped

    def gc(self) -> list[str]:
        """Delete data/manifest files no surviving snapshot references."""
        import shutil

        live_manifests = set()
        live_files = set()
        for s in self.log():
            for m in s["manifests"]:
                live_manifests.add(m)
        for m in live_manifests:
            with open(os.path.join(self.root, "metadata", m)) as f:
                for fe in json.load(f)["files"]:
                    live_files.add(os.path.dirname(fe["path"]))
        removed = []
        meta_dir = os.path.join(self.root, "metadata")
        for m in os.listdir(meta_dir):
            if m.startswith("manifest-") and m not in live_manifests:
                os.remove(os.path.join(meta_dir, m))
                removed.append(m)
        data_dir = os.path.join(self.root, "data")
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                full = os.path.join(data_dir, d)
                if os.path.abspath(full) not in {
                    os.path.abspath(p) for p in live_files
                }:
                    shutil.rmtree(full)
                    removed.append(d)
        return removed
