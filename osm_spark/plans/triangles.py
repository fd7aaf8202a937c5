"""Triangle counting + local clustering coefficient over the web graph.

The third structural signal next to PageRank (plans/pagerank.py) and
HITS (plans/hits.py): triangle density separates organically-linked
community pages from spam farms and link rings (a page whose
neighborhood never closes triangles is a hub of unrelated targets; one
whose neighborhood is a clique is inside a community) — a standard
web-corpus quality feature.

Spark-first shape — the classic degree-orientation formulation (the
one every large-scale system uses, because it is the one that survives
hubs):

- Undirected edges orient LOW -> HIGH under the total order
  (degree, node id).  Every triangle then has exactly ONE node with
  two out-edges (its minimum under the order), so each triangle is
  counted exactly once, no /6 correction, no duplicate pairs.
- Wedges enumerate by self-joining oriented edges on their source.
  Orientation is what bounds this: a node's out-degree under the order
  is at most O(sqrt(m)) for any graph, so a 10^8-in-link hub
  contributes ZERO wedges from its in-side — the all-pairs blowup the
  naive neighbor self-join hits at hub nodes cannot happen.  Total
  wedge volume is sum(outdeg^2) <= m^1.5, the theoretical optimum for
  exact counting.
- The wedge (b, c) closes iff oriented edge b->c exists: ONE more
  equi-join.  Per-corner attribution explodes each triangle to its 3
  nodes and aggregates — output-sized.
- Everything is joins + groupBys on node keys: AQE handles residual
  skew; no Python, no collects; clustering coefficient emits as exact
  integer fixed point (2*tri*1e6 DIV deg*(deg-1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) multigraph -> canonical undirected simple edges
    (a < b): self-loops dropped, duplicates and reverses collapsed."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    return (
        edges.select(a, b)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(und: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower to higher (degree, node).

    Returns (lo, hi) where lo precedes hi under the total order —
    lo's out-degree is bounded by O(sqrt(m)), the property that makes
    the wedge join hub-safe.
    """
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("n", "a")
                    .withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("n", "b")
                 .withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Edge list -> one row per triangle (x, y, z), x < y < z.

    Wedge join on the oriented source, closed by one membership join.
    Each triangle appears exactly once (counted at its order-minimum
    corner).
    """
    o = oriented_edges(undirected_edges(edges))
    l1 = o.select(F.col("lo").alias("p"), F.col("hi").alias("q1"))
    l2 = o.select(F.col("lo").alias("p"), F.col("hi").alias("q2"))
    wedges = l1.join(l2, "p").where(F.col("q1") < F.col("q2"))
    closed = wedges.join(
        o.select(F.col("lo").alias("q1"), F.col("hi").alias("q2"))
        .unionAll(
            o.select(F.col("hi").alias("q1"), F.col("lo").alias("q2"))
        )
        .where(F.col("q1") < F.col("q2"))
        .distinct(),
        ["q1", "q2"],
    )
    return closed.select(
        F.least("p", "q1").alias("x"),
        F.array_sort(F.array("p", "q1", "q2"))[1].alias("y"),
        F.greatest("p", "q2").alias("z"),
    )


def clustering(edges: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Per-node triangle count, degree, and local clustering coefficient
    as exact fixed point: cc_e6 = 2 * tri * scale DIV (deg * (deg-1)),
    0 for degree < 2.  One explode (3 rows per triangle) + node-keyed
    aggregations."""
    und = undirected_edges(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = (
        triangles(edges)
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
        F.when(
            F.col("deg") < 2, F.lit(0).cast("long")
        ).otherwise(
            F.expr(
                f"(2 * coalesce(tri, 0L) * {int(scale)})"
                " DIV (deg * (deg - 1))"
            )
        ).cast("long").alias("cc_e6"),
    )
