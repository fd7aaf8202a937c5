"""Single/multi-source shortest paths over the way graph.

The reference is an OSM data library; the canonical downstream use of
its way/node model is ROUTING — ways resolve to node chains
(reference osm/way.go WayNodes, re-expressed in the way-geometry
queries), node chains induce a weighted road graph, and queries ask
for distances from a source set.  This module is the Spark-first
shortest-path layer over that graph.

Spark-first shape — bulk-synchronous Bellman-Ford relaxation, the same
iterative frontier pattern as plans/components.py and
plans/pagerank.py:

- **Each round is one edge relaxation**: join the current distance
  frame to the edge list on ``src``, propose ``dist + w`` per ``dst``,
  take the per-node min, and fold it into the running distances with
  a single ``least``.  One join + one node-keyed aggregation per
  round — the only shuffles — and the edge frame is persisted ONCE by
  the caller and re-read every round.
- **Frontier-pruned**: a node whose distance did not improve in round
  k proposes nothing new in round k+1, so the relax join runs only
  over the ACTIVE frontier (changed nodes), which is how the plan
  survives a planet-scale graph where most of the graph is settled
  after a few rounds around the sources.
- **Integer-exact**: weights and distances are int64; ``min`` /
  ``least`` over deterministic frames are the only operations, so
  Spark and DuckDB reproduce the round-k state bit-for-bit whether or
  not relaxation has converged (the oracle-parity property; same
  argument as min_label_components).  Unreached nodes carry NULL —
  both engines' ``least`` skips NULLs, which makes NULL behave as
  +infinity without a sentinel.
- Distance state is node-sized and stays distributed; lineage is cut
  per round by ``persist_fn`` (the caller passes localCheckpoint —
  nested two-join plans re-analyze quadratically under lazy persist,
  same measurement as plans/components.py).

After ``iters`` rounds the frame holds exact shortest distances among
paths of <= ``iters`` edges (Bellman-Ford invariant); with
``iters >= graph diameter`` that is the true shortest distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relax_rounds(
    nodes: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    id_col: str = "node",
    iters: int = 6,
    persist_fn=None,
    frontier: bool = True,
) -> DataFrame:
    """-> (node, dist) after ``iters`` Bellman-Ford rounds.

    ``edges`` must carry (src, dst, w) with int64 w >= 0 — persist it
    when iters > 1.  ``sources`` is a 1-column frame of source node
    ids (distance 0).  NULL dist == unreached.
    """
    n = nodes.select(F.col(id_col).alias("node"))
    src_set = sources.toDF("node").select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    dist = n.join(src_set, "node", "left")
    # round 0 frontier = the sources themselves
    front = dist.where(F.col("dist").isNotNull())
    for _ in range(iters):
        cand = (
            edges.join(front, edges["src"] == front["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).cast("long").alias("d"),
            )
            .groupBy("node")
            .agg(F.min("d").alias("m"))
        )
        nxt = dist.join(cand, "node", "left").select(
            "node",
            F.least(F.col("dist"), F.col("m")).alias("dist"),
            # improved iff the proposal strictly beats the held value
            (
                F.col("m").isNotNull()
                & (F.col("dist").isNull() | (F.col("m") < F.col("dist")))
            ).alias("_changed"),
        )
        if persist_fn is not None:
            nxt = persist_fn(nxt)
        front = (
            nxt.where(F.col("_changed")).select("node", "dist")
            if frontier
            else nxt.select("node", "dist").where(F.col("dist").isNotNull())
        )
        dist = nxt.select("node", "dist")
    return dist


def relax_rounds_sql(iters: int, out_alias: str = "doc_id") -> str:
    """Chained-CTE DuckDB twin of relax_rounds: given prior CTEs
    ``n(node)``, ``e(src, dst, w)`` and ``s(node)`` (sources), appends
    d0..d{iters} — one relaxation per round, ``least`` skipping NULLs
    in both engines so NULL is +infinity — plus the final projection
    (unreached surfaces as dist -1 to keep the output frame
    NULL-free for the value hash)."""
    parts = [""",
    d0 AS (SELECT n.node,
                  CASE WHEN s.node IS NULL THEN NULL
                       ELSE CAST(0 AS BIGINT) END AS dist
           FROM n LEFT JOIN s ON s.node = n.node)"""]
    for k in range(iters):
        parts.append(f""",
    c{k} AS (SELECT e.dst AS node, min(d{k}.dist + e.w) AS m
             FROM e JOIN d{k} ON e.src = d{k}.node
             WHERE d{k}.dist IS NOT NULL GROUP BY 1),
    d{k + 1} AS (SELECT d{k}.node, least(d{k}.dist, c{k}.m) AS dist
                 FROM d{k} LEFT JOIN c{k} ON c{k}.node = d{k}.node)""")
    parts.append(f"""
    SELECT node AS {out_alias},
           CAST(coalesce(dist, -1) AS BIGINT) AS dist,
           CAST(dist IS NOT NULL AS INT) AS reached
    FROM d{iters}""")
    return "".join(parts)
