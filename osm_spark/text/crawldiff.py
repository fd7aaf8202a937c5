"""Recrawl snapshot diff — per-url change actions between two crawls.

The webtext form of the reference's change/diff semantics (osmchange
create/modify/delete merge, `change.go:66-124`; old/new action pairs,
`diff.go:84-109`): two crawl snapshots of the same url space diff into
per-url actions, the primitive behind incremental corpus refresh
(recrawl only what changed, retire what disappeared, ingest what
appeared).

Spark-first shape:

- **One full outer join on the url key** — each side is one url-keyed
  exchange; at 10^12 pages both snapshots are url-bucketed Iceberg
  tables and the join co-locates without either side broadcasting.
- **Change detection by digest, not by payload comparison**: md5 of the
  content column computes scan-side (inside the projection, in
  codegen), so the exchange carries 32-byte digests instead of page
  bodies — the difference between shuffling 100 TB and shuffling 3 TB.
- Actions are total and disjoint: created (url only in new), deleted
  (url only in old), modified (both, digest differs), unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_digests(snap: DataFrame, url_col: str, content_col) -> DataFrame:
    """-> (url, md5 digest): the shuffle-ready projection of a crawl
    snapshot — digests computed before the exchange."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    return snap.select(
        F.col(url_col).alias("url"), F.md5(c).alias("digest")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
) -> DataFrame:
    """Per-url action between two snapshots.

    Columns: url, action ('created'|'modified'|'deleted'|'unchanged'),
    old_md5, new_md5 (null on the absent side)."""
    o = snapshot_digests(old, url_col, content_col).withColumnRenamed(
        "digest", "old_md5"
    )
    n = snapshot_digests(new, url_col, content_col).withColumnRenamed(
        "digest", "new_md5"
    )
    j = o.join(n, "url", "full_outer")
    action = (
        F.when(F.col("old_md5").isNull(), F.lit("created"))
        .when(F.col("new_md5").isNull(), F.lit("deleted"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("url", action.alias("action"), "old_md5", "new_md5")


def delta_stats(diff: DataFrame) -> DataFrame:
    """Per-action rollup: count + a deterministic sample url (min) —
    the recrawl planner's summary view."""
    return diff.groupBy("action").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("url").alias("first_url"),
    )
