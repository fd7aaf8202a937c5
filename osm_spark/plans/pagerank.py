"""Link-graph extraction + scaled-integer PageRank.

The web-analytics counterpart of the reference's iterative relation-DAG
ordering (reference osm/relation child-first iteration, re-expressed in
plans/iterate.py): pages link to pages, the link graph is extracted
from the HTML itself, and an iterative fixed-point score propagates
over it.

Spark-first shapes:

- **Extraction is column regex**: ``regexp_extract_all`` over the html
  column + one explode — no UDF, no parser.
- **Each PageRank iteration is ONE join + ONE aggregation** keyed by
  node id — the canonical bulk-synchronous shape; at 10^12 edges the
  edge frame is pre-joined with out-degrees once, persisted, and
  re-used across iterations, so each step shuffles only the (node,
  contribution) pairs.
- **Integer-exact arithmetic**: scores are scaled integers (1e6 = rank
  1.0) and every step uses integer division (``DIV``), so Spark and
  DuckDB reproduce the fixed point bit-for-bit — no float summation
  order or libm parity risk anywhere.  With damping d = num/den:

      pr_0(v)     = scale
      contrib(u)  = pr_k(u) DIV outdeg(u)
      pr_{k+1}(v) = (scale*(den-num)) DIV den
                    + (num * sum_in(v) contrib) DIV den

  Dangling nodes (outdeg 0) simply contribute nothing — the caller's
  graph construction decides whether that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default for sites whose page ids live in the path (the synthetic
# corpus shape) — pass your own pattern for other url schemes
HREF_RE = r'href="/doc/([0-9]+)"'


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def extract_links(pages: DataFrame, id_col: str, html_col,
                  href_re: str = HREF_RE) -> DataFrame:
    """(src, dst) edge list from anchor hrefs in the html column (one
    row per link occurrence, duplicates preserved — PageRank weights
    parallel edges naturally through outdeg).  ``href_re`` group 1 must
    capture the numeric target id; sites whose urls don't embed an id
    resolve hrefs to ids with a join on a url->id table instead."""
    hrefs = F.regexp_extract_all(_c(html_col), F.lit(href_re), F.lit(1))
    return pages.select(
        F.col(id_col).alias("src"), F.explode(hrefs).alias("t")
    ).select("src", F.col("t").cast("long").alias("dst"))


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iters: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    persist_fn=None,
) -> DataFrame:
    """Scaled-integer PageRank -> (node, pr) after ``iters`` steps.

    ``edges`` should be persisted by the caller when iters > 1 — it is
    re-read every iteration (pre-joined here with out-degrees exactly
    once).  ``persist_fn`` (e.g. the caller's cache registry) is
    applied to each iteration's score frame; without it the final plan
    nests every prior step and the optimizer re-analyzes the whole
    chain per stage — scores are node-sized state, so unlike a k-means
    centroid set they must stay distributed and lineage must be cut by
    caching, not by collecting."""
    base = (scale * (damping_den - damping_num)) // damping_den
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").select("src", "dst", "outdeg")
    if persist_fn is not None:
        e = persist_fn(e)
    n = nodes.select(F.col(id_col).alias("node"))
    pr = n.select("node", F.lit(int(scale)).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = e.join(pr, e["src"] == pr["node"]).select(
            F.col("dst").alias("node"),
            F.expr("pr DIV outdeg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = n.join(sums, "node", "left").select(
            "node",
            (
                F.lit(int(base))
                + F.expr(
                    f"({damping_num} * coalesce(s, 0L)) DIV {damping_den}"
                )
            ).cast("long").alias("pr"),
        )
        if persist_fn is not None:
            pr = persist_fn(pr)
    return pr


# anchor pattern capturing (target id, anchor text) — the inlink-text
# signal search/training pipelines aggregate per target page
ANCHOR_RE = r'<a href="/doc/([0-9]+)">([a-z0-9]+)</a>'


def extract_anchors(pages: DataFrame, id_col: str, html_col,
                    anchor_re: str = ANCHOR_RE) -> DataFrame:
    """(src, dst, anchor) triples from anchor tags in the html column.

    Column-regex extraction like :func:`extract_links` — the SAME
    pattern is evaluated once per capture group (`regexp_extract_all`
    returns one group per call) and the two arrays zip positionally,
    so href and text stay paired even when a page repeats a target
    with different anchor words.  No UDF, no parser."""
    pat = F.lit(anchor_re)
    hrefs = F.regexp_extract_all(_c(html_col), pat, F.lit(1))
    texts = F.regexp_extract_all(_c(html_col), pat, F.lit(2))
    return (
        pages.select(
            F.col(id_col).alias("src"),
            F.explode(F.arrays_zip(hrefs.alias("h"), texts.alias("t"))).alias("z"),
        )
        .select(
            "src",
            F.col("z.h").cast("long").alias("dst"),
            F.col("z.t").alias("anchor"),
        )
    )


def anchor_rollup(anchors: DataFrame) -> DataFrame:
    """Per-target inlink-text profile: inlink count, distinct anchor
    vocabulary (sorted '|' join — deterministic in every engine), the
    lexicographically-first anchor, and the minimum linking source.
    ONE dst-keyed aggregation; at web scale this is the classic
    anchor-text index build (skew on mega-targets handled by AQE)."""
    return anchors.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_inlinks"),
        F.countDistinct("anchor").cast("long").alias("n_anchor_terms"),
        F.array_join(F.array_sort(F.collect_set("anchor")), "|").alias("anchors"),
        F.min("anchor").alias("first_anchor"),
        F.min("src").alias("min_src"),
    )
