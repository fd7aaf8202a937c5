"""Custom stateful streaming operators via applyInPandasWithState.

The foreachBatch path (streaming/replication.py) owns the bucketed
table state; this module is the OTHER stateful surface the engine
offers — Spark-managed per-key state inside the streaming engine
itself (RocksDB/HDFS state store, restored from the checkpoint on
restart), for operators whose state is small per key and hot per
micro-batch:

- ``running_element_stats``: per-(type, id) update count + max version
  over a change stream — the stream analog of the HistoryDatasource
  rollup, with state carried by the engine across batches AND restarts.

Kernel contract: one Arrow-batched pandas call per key per micro-batch;
state is a plain tuple, no Python objects to pickle per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def running_element_stats(changes: DataFrame) -> DataFrame:
    """Per-(type, id) running (n_updates, max_version) via engine-managed
    state. ``changes`` is a STREAMING frame with at least
    (type, id, version). Output mode: update."""
    import pandas as pd

    def fn(key, pdfs, state):
        n, maxv = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                maxv = max(maxv, int(pdf["version"].max()))
        state.update((n, maxv))
        yield pd.DataFrame(
            {
                "type": [key[0]],
                "id": [key[1]],
                "n_updates": [n],
                "max_version": [maxv],
            }
        )

    return changes.groupBy("type", "id").applyInPandasWithState(
        fn,
        outputStructType="type string, id long, n_updates long, max_version int",
        stateStructType="n long, maxv int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
