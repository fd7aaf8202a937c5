"""HistoryDatasource — osm.HistoryDatasourcer over DataFrames.

The reference interface (datasource.go:9-30) serves per-element version
histories (NodeHistory/WayHistory/RelationHistory + NotFound); its map
implementation is built by HistoryDatasource.add (datasource.go:27-70,
verified by the ``history_group`` driver query). Here the datasource is
a DataFrame provider: one history table keyed by (type, id), selectors
returning version-ordered frames, plus the time-travel read the osmapi
options family exposes (``At(t)``):

- ``at(etype, id, t)``: the visible version as of ``t`` using the
  CommittedAt fallback (node.go:65-71: ``coalesce(committed, ts)``).
- ``snapshot_at(t)``: the whole table as of ``t`` — one window pass,
  the distributed form (never a per-id loop).

Scale note: the per-id getters are lookup conveniences (predicate
pushdown turns them into keyed scans on a sorted/bucketed table);
bulk annotation always goes through the join-based planners in
``osm_spark.temporal`` — this facade is the API surface, not a new
execution path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class HistoryDatasource:
    def __init__(self, elements: DataFrame):
        """elements: (type, id, version, visible, changeset, ts,
        committed nullable, ...payload)."""
        self.elements = elements

    def _history(self, etype: str, eid: int) -> DataFrame:
        return (
            self.elements.filter(
                (F.col("type") == etype) & (F.col("id") == eid)
            ).orderBy("version")
        )

    def node_history(self, eid: int) -> DataFrame:
        return self._history("node", eid)

    def way_history(self, eid: int) -> DataFrame:
        return self._history("way", eid)

    def relation_history(self, eid: int) -> DataFrame:
        return self._history("relation", eid)

    @staticmethod
    def not_found(history: DataFrame) -> bool:
        """datasource.go NotFound: empty history <=> not found."""
        return history.isEmpty()

    @staticmethod
    def _committed_at():
        # CommittedAt fallback (node.go:65-71)
        return F.coalesce(F.col("committed"), F.col("ts"))

    def at(self, etype: str, eid: int, t) -> DataFrame:
        """The version of (etype, eid) visible as of ``t`` (osmapi
        At(t)): latest version committed <= t; empty if that version is
        deleted (visible=false) or none exists."""
        h = self._history(etype, eid).filter(
            self._committed_at() <= F.lit(t).cast("timestamp")
        )
        w = Window.partitionBy("type", "id").orderBy(F.col("version").desc())
        return (
            h.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & F.col("visible"))
            .drop("_rn")
        )

    def snapshot_at(self, t) -> DataFrame:
        """Every element's visible version as of ``t`` — the distributed
        time-travel read (one window over the history table)."""
        h = self.elements.filter(
            self._committed_at() <= F.lit(t).cast("timestamp")
        )
        w = Window.partitionBy("type", "id").orderBy(F.col("version").desc())
        return (
            h.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & F.col("visible"))
            .drop("_rn")
        )
