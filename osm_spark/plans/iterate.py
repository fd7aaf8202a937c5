"""Iterative graph operators — ChildFirstOrdering (reference
annotate/order.go:21-167).

The reference DFS-orders relation members so children are annotated
before parents, tolerating cycles (order.go:137-146: a back-edge to a
relation already on the path is skipped). The relational equivalent is
a bottom-up fixpoint: depth(r) = 0 for relations with no relation
children; else 1 + max(children depths); processing order = ascending
depth. Cycle participants never resolve — after the fixpoint stalls
they are assigned depth = (max resolved depth + 1), mirroring the
reference's "process anyway, skip the back-edge" behavior.

Each iteration is one join + aggregate over the UNRESOLVED frontier
only; iterations = DAG depth (OSM relation nesting is shallow — the
reference uses the same assumption).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def child_first_depths(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """nodes: (id); edges: (parent, child) relation->relation membership.

    Returns (id, depth) with children strictly shallower than parents
    (acyclic part); cycle members get max_depth + 1.
    """
    spark = nodes.sparkSession
    edges = edges.select("parent", "child").distinct()
    parents_with_children = edges.select(F.col("parent").alias("id")).distinct()
    resolved = (
        nodes.join(parents_with_children, "id", "left_anti")
        .select("id", F.lit(0).alias("depth"))
        .localCheckpoint()
    )
    # EVERY per-iteration frame is localCheckpoint'ed (eager): without
    # the truncation the unresolved/newly lineage nests one anti-join
    # per iteration and each isEmpty() replans the whole chain —
    # measured 284s for a 10-level DAG of 999 nodes vs ~10s truncated.
    unresolved = (
        nodes.join(resolved, "id", "left_anti").select("id").localCheckpoint()
    )

    for _ in range(max_iter):
        if unresolved.isEmpty():
            break
        # a parent resolves when ALL its children are resolved
        stat = (
            edges.join(unresolved.withColumnRenamed("id", "parent"), "parent")
            .join(
                resolved.withColumnRenamed("id", "child"), "child", "left"
            )
            .groupBy("parent")
            .agg(
                F.count("*").alias("n_children"),
                F.count("depth").alias("n_resolved"),
                F.max("depth").alias("max_child_depth"),
            )
        )
        newly = (
            stat.filter(F.col("n_children") == F.col("n_resolved"))
            .select(
                F.col("parent").alias("id"),
                (F.col("max_child_depth") + 1).alias("depth"),
            )
            .localCheckpoint()
        )
        if newly.isEmpty():
            break  # only cycles remain
        resolved = resolved.unionByName(newly).localCheckpoint()
        unresolved = unresolved.join(newly, "id", "left_anti").localCheckpoint()

    # cycle members: process last (reference skips back-edges and still
    # handles every relation)
    max_depth = resolved.agg(F.max("depth")).collect()[0][0] or 0
    leftovers = unresolved.select("id", F.lit(max_depth + 1).alias("depth"))
    return resolved.unionByName(leftovers)
