"""Scaled-integer HITS (hubs & authorities) over the link graph.

The second classic link-quality signal next to PageRank
(plans/pagerank.py) — Kleinberg's mutual reinforcement: a page is a
good AUTHORITY if good hubs link to it, a good HUB if it links to good
authorities.  Web-corpus curation uses both: PageRank for global
popularity, HITS for directory/reference structure.

Spark-first shapes (same discipline as pagerank_int):

- Each half-step is ONE edge⋈score join + ONE node-keyed aggregation —
  the canonical BSP shape; shuffle volume per half-step is the edge
  count, never a self-join.
- **Normalization without floats**: textbook HITS L2-normalizes each
  round; any float norm would re-introduce summation-order divergence.
  Instead each half-step rescales by the round's MAX score:
  ``s' = s * scale DIV max(s)`` — a monotone transform (the ranking is
  unchanged), integer-exact in every engine, and it bounds scores to
  ``scale`` so the next half-step's sums stay inside int64 for any
  graph with in/out-degree < 2^63 / scale (9e12 at the default scale —
  far past any real host's degree).
- The max is a ONE-ROW aggregate crossJoin-broadcast back onto the
  node frame (parameter-sized, like the engine's k-means centroids) —
  scores themselves are node-sized state and stay distributed;
  ``persist_fn`` (localCheckpoint in the queries layer) cuts lineage
  per round exactly like the engine's other iterative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rescale(scored: DataFrame, col: str, scale: int) -> DataFrame:
    """s -> s * scale DIV max(s); max computed once, broadcast back.

    ``greatest(max, 1)`` guards the empty-graph round (all-zero scores
    would otherwise divide by zero — null in Spark, error in DuckDB).
    """
    m = scored.agg(F.greatest(F.max(col), F.lit(1).cast("long")).alias("_m"))
    return scored.crossJoin(F.broadcast(m)).select(
        "node",
        F.expr(f"({col} * {int(scale)}) DIV _m").cast("long").alias(col),
    )


def hits_int(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iters: int = 3,
    scale: int = 1_000_000,
    persist_fn=None,
) -> DataFrame:
    """HITS -> (node, auth, hub) after ``iters`` rounds.

    ``edges`` is (src, dst), persisted by the caller when iters > 1.
    Round k: auth = max-rescaled in-sum of hubs, then hub =
    max-rescaled out-sum of auths.  Both engines replay the identical
    integer arithmetic, so unconverged states match bit-for-bit.
    Nodes with no in-edges (resp. out-edges) score 0 on that axis.
    """
    n = nodes.select(F.col(id_col).alias("node"))
    hub = n.select("node", F.lit(int(scale)).cast("long").alias("hub"))
    auth = None

    def _half(scores: DataFrame, score_col: str, join_on: str,
              emit_key: str, out_col: str) -> DataFrame:
        # edge⋈score join + node-keyed sum, materialized ONCE via
        # persist_fn BEFORE the rescale — the max aggregate and the
        # rescale projection then both read the cut lineage instead of
        # recomputing the join (this halves the per-half-step work).
        raw = (
            edges.join(scores, edges[join_on] == scores["node"])
            .groupBy(edges[emit_key].alias("node"))
            .agg(F.sum(score_col).alias("s"))
        )
        full = n.join(raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias(out_col)
        )
        if persist_fn is not None:
            full = persist_fn(full)
        return _rescale(full, out_col, scale)

    for _ in range(iters):
        auth = _half(hub, "hub", "src", "dst", "auth")
        hub = _half(auth, "auth", "dst", "src", "hub")
    return auth.join(hub, "node").select("node", "auth", "hub")
