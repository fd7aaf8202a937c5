"""Connected components over near-dup candidate pairs.

The completion step every dedup pipeline needs after pair generation
(MinHash-LSH / SimHash bands / n-gram Jaccard emit PAIRS; retention
policy needs CLUSTERS): group transitively-linked documents and elect
one canonical representative per cluster.

Spark-first shape — bulk-synchronous min-label propagation, the same
iterative frontier pattern as the reference's child-first relation-DAG
ordering (reference osm/relation.go iteration, re-expressed in
plans/iterate.py) and plans/pagerank.py:

- **Each round is one neighbor-min step (join + node-keyed agg) plus
  one pointer-jump step** (labels self-join: ``lbl' = min(lbl,
  lbl[lbl])``, valid because labels are always live node ids — the
  min over ids).  The jump doubles the propagation reach per round,
  so the fixed point arrives in O(log diameter) rounds instead of
  O(diameter) — the property that makes the plan survive a 10^12-node
  web graph, where chains hundreds of hops long exist but log2 of any
  plausible diameter is < 40.  Each round shuffles only (node, label)
  pairs; the edge frame is symmetrized + persisted ONCE.
- **Integer-exact**: labels are the int64 doc ids themselves; `least`
  / `min` are the only operations, so Spark and DuckDB reproduce the
  fixed point bit-for-bit regardless of convergence.
- Label state is node-sized and must stay distributed: lineage is cut
  by ``persist_fn`` per round (the caller's cache registry), never by
  collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Undirected (a, b) candidate pairs -> directed both-ways edge
    list (src, dst).  Callers should persist the result when iterating."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.unionByName(rev)


def min_label_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iters: int = 4,
    jump: bool = True,
    persist_fn=None,
) -> DataFrame:
    """-> (node, lbl) after ``iters`` min-label(+jump) rounds.

    ``edges`` must be the symmetrized (src, dst) frame — persist it
    when iters > 1 (re-read every round).  With ``jump`` the reach
    after k rounds is >= 2^k - 1 hops (neighbor step extends by one,
    jump step doubles), so lbl converges to the component's minimum
    node id once ``2**iters - 1 >= diameter``; with fewer rounds both
    engines still agree exactly (every update is a pure integer min
    over a deterministic frame), which is what the oracle parity
    check relies on.
    """
    n = nodes.select(F.col(id_col).alias("node"))
    lbl = n.select("node", F.col("node").alias("lbl"))
    for _ in range(iters):
        nb_min = (
            edges.join(lbl, edges["src"] == lbl["node"])
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("m"))
        )
        lbl = lbl.join(nb_min, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("m"), F.col("lbl"))).alias("lbl"),
        )
        if jump:
            # labels are node ids, so every lbl has a row in lbl itself;
            # inner self-join resolves each node's label's label.
            parent = lbl.select(
                F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
            )
            lbl = lbl.join(parent, lbl["lbl"] == parent["p_node"]).select(
                "node", F.least(F.col("lbl"), F.col("p_lbl")).alias("lbl")
            )
        if persist_fn is not None:
            lbl = persist_fn(lbl)
    return lbl


def cluster_stats(labels: DataFrame) -> DataFrame:
    """(node, lbl) -> per-node cluster view: cluster id, size, and the
    canonical flag (a cluster keeps its minimum-id member — the usual
    keep-one retention policy).  One size aggregation + one broadcast-
    friendly join back."""
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        F.col("node"),
        F.col("lbl").alias("cluster"),
        F.col("cluster_size"),
        (F.col("node") == F.col("lbl")).cast("int").alias("is_canonical"),
    )
