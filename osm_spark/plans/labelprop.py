"""Semi-supervised label propagation over the link graph.

Components answers "which nodes are connected"; classification needs
"which SEED does each node belong to" — topic labels from a curated
page subset spreading over links, the classic web-scale
semi-supervised classifier (label propagation / LPA with immutable
seeds).  Each round every unlabeled node adopts the MAJORITY label
among its labeled neighbors (ties -> smallest label; no labeled
neighbor -> keep the previous state), while seed labels never move.

BSP shape, same discipline as components/pagerank/kcore: per round
ONE edge join against the labeled frontier, ONE (node, label) vote
count with map-side partials, ONE node-keyed argmax (min over the
(-count, label) struct — integer-exact, deterministic ties), and a
label-state merge; node-sized state, lineage cut per round.  Votes
shuffle |labeled-adjacent edges| rows, never the graph squared.
Round-deterministic: the state after R rounds is a pure function of
(edges, seeds), so a chained-CTE oracle replays it bit-for-bit
whether or not propagation has converged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int,
    persist_fn=None,
) -> DataFrame:
    """-> (node, lbl) after ``rounds`` propagation rounds.

    ``nodes``: (node, seed) with seed NULL for unlabeled rows;
    ``edges``: symmetrized (src, dst) — persist it upstream.  ``lbl``
    is NULL for nodes no label has reached."""
    n = nodes.select("node", "seed")
    lbl = n.select("node", F.col("seed").alias("lbl"))
    for _ in range(rounds):
        msgs = (
            edges.join(
                lbl.where(F.col("lbl").isNotNull()),
                edges["src"] == lbl["node"],
            )
            .select(F.col("dst").alias("node"), "lbl")
        )
        votes = msgs.groupBy("node", "lbl").agg(
            F.count(F.lit(1)).alias("c")
        )
        pick = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.col("lbl").alias("lbl"),
                    )
                ).alias("b")
            )
            .select("node", F.col("b.lbl").alias("p_lbl"))
        )
        lbl = (
            n.join(pick, "node", "left")
            .join(
                lbl.select("node", F.col("lbl").alias("prev")),
                "node",
                "left",
            )
            .select(
                "node",
                F.when(F.col("seed").isNotNull(), F.col("seed"))
                .otherwise(F.coalesce(F.col("p_lbl"), F.col("prev")))
                .alias("lbl"),
            )
        )
        if persist_fn is not None:
            lbl = persist_fn(lbl)
    return lbl


def label_propagation_sql(
    nodes_cte: str, edges_cte: str, rounds: int
) -> tuple[str, str]:
    """DuckDB twin: chained CTEs over ``nodes_cte`` (node, seed) and
    symmetrized ``edges_cte`` (src, dst).  Returns (extra_ctes,
    final_select) producing (node, lbl)."""
    parts = [
        f"l0 AS (SELECT node, seed AS lbl FROM {nodes_cte})"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"m{r} AS (SELECT e.dst AS node, l.lbl FROM {edges_cte} e "
            f"JOIN l{r - 1} l ON l.node = e.src "
            f"WHERE l.lbl IS NOT NULL)"
        )
        parts.append(
            f"v{r} AS (SELECT node, lbl, count(*) AS c FROM m{r} "
            f"GROUP BY node, lbl)"
        )
        parts.append(
            f"p{r} AS (SELECT node, lbl FROM ("
            f"SELECT node, lbl, row_number() OVER ("
            f"PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn "
            f"FROM v{r}) WHERE rn = 1)"
        )
        parts.append(
            f"l{r} AS (SELECT n.node, "
            f"CASE WHEN n.seed IS NOT NULL THEN n.seed "
            f"ELSE coalesce(p.lbl, l.lbl) END AS lbl "
            f"FROM {nodes_cte} n "
            f"LEFT JOIN p{r} p ON p.node = n.node "
            f"LEFT JOIN l{r - 1} l ON l.node = n.node)"
        )
    final = f"SELECT node, lbl FROM l{rounds}"
    return ",\n    ".join(parts), final
