"""k-core decomposition (fixed-k peeling) over the link graph.

The web-graph hygiene operator downstream of PageRank/components: the
k-core is the maximal subgraph where every node keeps >= k neighbors
INSIDE the subgraph.  Link-farm detection, crawl-frontier seeding and
graph sparsification all gate on it — degree alone is spoofable by
pointing at doomed nodes; coreness is not, because the peel removes
those nodes and re-checks.

Spark-first shape, same BSP discipline as plans/components.py /
pagerank.py:

- Each peel round is ONE node-keyed degree aggregation over the
  surviving edge set + TWO semi-joins filtering edges whose endpoints
  died.  Work per round is O(|surviving edges|) and strictly
  decreases; at web scale the cascade localizes around the removed
  fringe after the first rounds.
- Integer-exact and round-deterministic: membership after R rounds is
  a pure function of the edge set (count + >= comparisons only), so a
  SQL oracle replaying R rounds agrees bit-for-bit whether or not the
  peel has converged — the same convergence-free parity contract as
  min_label_components.
- Edge/node state stays distributed; lineage is cut per round via
  ``persist_fn`` (localCheckpoint at the call sites), never by
  collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_membership(
    edges: DataFrame,
    k: int,
    rounds: int,
    persist_fn=None,
) -> DataFrame:
    """-> (node, core_deg) for nodes surviving ``rounds`` peel rounds.

    ``edges`` must be the symmetrized distinct (src, dst) frame with
    no self-loops (symmetrize + dropDuplicates upstream); persist it —
    every round re-reads the current cut of it.  ``core_deg`` is the
    node's degree inside the surviving subgraph: >= k for every row
    once the peel has converged (2-core of a cycle converges in one
    round; adversarial chains need O(n) — callers pick ``rounds`` for
    the oracle window and a `while changed` driver loop in
    production, where the changed-count is one cheap action per
    round)."""
    live = edges
    deg = None
    for _ in range(rounds):
        deg = live.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("core_deg")
        )
        alive = deg.where(F.col("core_deg") >= k).select("node")
        live = (
            live.join(
                alive.select(F.col("node").alias("src")), "src", "semi"
            )
            .join(alive.select(F.col("node").alias("dst")), "dst", "semi")
        )
        if persist_fn is not None:
            live = persist_fn(live)
    final = live.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )
    return final


def kcore_membership_sql(
    edges_cte: str, k: int, rounds: int
) -> tuple[str, str]:
    """DuckDB twin: chained CTEs replaying each peel round over the
    symmetrized edge CTE ``edges_cte`` (columns src, dst).  Returns
    (extra_ctes, final_select); the caller splices the CTE text after
    its own WITH definitions and appends the final SELECT."""
    parts = [f"e0 AS (SELECT src, dst FROM {edges_cte})"]
    for r in range(rounds):
        parts.append(
            f"d{r} AS (SELECT src AS node, count(*) AS deg "
            f"FROM e{r} GROUP BY src)"
        )
        parts.append(
            f"a{r} AS (SELECT node FROM d{r} WHERE deg >= {k})"
        )
        parts.append(
            f"e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e "
            f"WHERE e.src IN (SELECT node FROM a{r}) "
            f"AND e.dst IN (SELECT node FROM a{r}))"
        )
    final = (
        f"SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg "
        f"FROM e{rounds} GROUP BY src"
    )
    return ",\n    ".join(parts), final
