"""Count-Min sketch: mergeable frequency estimation + heavy hitters.

Completes the engine's mergeable-sketch family (KMV distinct count,
HLL registers, Bloom membership — text/sketch.py, text/bloom.py) with
the FREQUENCY sketch: a depth x width counter grid where every key
increments one counter per row (independent hash per row) and a key's
estimate is the MIN over its row counters — an upper bound on the true
count (never under), within eps*N with probability 1-delta for
width = e/eps, depth = ln(1/delta).  Training pipelines use it for
heavy-hitter vocab discovery and frequency capping without a full
token-count shuffle.

Spark-first shapes:

- **Pre-aggregate, then sketch**: the batch formulation first collapses
  token occurrences to (token, n) with ONE map-side-combinable groupBy
  (shuffle volume = distinct tokens), THEN explodes each distinct
  token to its depth cells — the (row, bucket) shuffle is
  |vocab| * depth, not |corpus| * depth.  A naive per-occurrence
  explode would multiply the corpus shuffle by depth for the same
  result (counter sums commute).
- **Bounded state**: the sketch itself is at most depth*width rows —
  parameter-sized, broadcastable; per-partition sketches merge by
  cell-wise SUM (the groupBy does exactly this), the property that
  makes CMS streamable and tree-aggregatable at any scale.
- **Deterministic hashing**: md5-derived bucket per (row, token) —
  a pure function of the key (no JVM hash seed), so any engine
  reproduces the grid bit-for-bit (oracle discipline, same as
  webprep.sample_hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 16


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def cms_bucket(token, row_id, width: int = WIDTH) -> Column:
    """Bucket index for (row, token): 20 md5 bits of 'cms<row>|<token>'
    mod width — deterministic across engines/runs/partitionings."""
    h = F.md5(
        F.concat(F.lit("cms"), _c(row_id).cast("string"), F.lit("|"), _c(token))
    )
    return (F.conv(F.substring(h, 1, 5), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def cms_bucket_sql(token_expr: str, row_expr: str, width: int = WIDTH) -> str:
    """DuckDB twin of :func:`cms_bucket` (strpos hex-digit fold — the
    proven cross-engine md5-bits idiom, see webprep.sample_hash)."""
    h = f"md5('cms' || CAST({row_expr} AS VARCHAR) || '|' || {token_expr})"
    digit = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    terms = " + ".join(
        f"({digit.format(h=h, i=i + 1)}) * {16 ** (4 - i)}" for i in range(5)
    )
    return f"(({terms}) % {width})"


def cms_build(
    token_counts: DataFrame,
    token_col: str = "token",
    count_col: str = "n",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(token, n) -> sketch cells (row_id, bucket, cnt).

    Input is the pre-aggregated distinct-token frame; each token lands
    in one bucket per row and cell counts SUM — so sketches built from
    any partition/shard union merge into the same grid.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_id")
    return (
        token_counts.select(
            F.col(token_col).alias("t"), F.col(count_col).alias("n"), rows
        )
        .select("row_id", cms_bucket("t", "row_id", width), "n")
        .groupBy("row_id", "bucket")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """candidates + est_n = min over depth rows of the token's cells.

    The sketch is depth*width rows — broadcast; the candidate side
    never shuffles except the final token-keyed min (map-side
    combinable).  A cell missing from the sketch means count 0.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_id")
    probes = candidates.select(
        F.col(token_col).alias("t"), rows
    ).select("t", "row_id", cms_bucket("t", "row_id", width))
    hits = probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
    est = hits.groupBy("t").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_n")
    )
    return candidates.join(
        est, candidates[token_col] == est["t"]
    ).drop("t")
