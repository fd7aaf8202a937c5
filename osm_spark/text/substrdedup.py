"""Exact substring deduplication — remove repeated k-token spans.

The span-level form of corpus dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): any k-token window whose
exact text occurs more than once in the corpus is removed from every
occurrence EXCEPT the first. Document-level dedup (text/dedup.py) keeps
or drops whole pages; this operator scrubs the duplicated *spans* —
boilerplate, licenses, navigation chrome — while keeping the novel
text around them.

Spark-first shape (mirrors the reference's packed-id clustered
sort/group discipline — one key-shuffle, never all-pairs):

- **k-gram spans**: each doc explodes to its (pos, md5(k tokens))
  windows via `sequence` + `slice` column HOFs — JVM-side, no Python.
- **One shuffle keyed by the gram digest**: `groupBy(g)` computes the
  occurrence count AND the first occurrence (`min(struct(doc_id,
  pos))`) in one partial-aggregated pass; a span is a duplicate iff
  its gram count > 1 and it is not the first occurrence.
- **Scrub in codegen**: duplicate span starts collect per doc (bounded
  by tokens-per-doc, not corpus size) and a `filter((tok, i) -> no
  span covers i)` HOF rebuilds the cleaned token stream.

At 10^12 docs the gram table is |tokens| rows of (8-byte xxhash64 key,
doc_id, pos) — the md5 hex key is kept here only for cross-engine
oracle parity; the count>1 filter kills the (dominant) unique-gram
mass before the join back, and AQE splits hot boilerplate grams.
Suffix-array dedup finds maximal repeats of ANY length ≥ k; the
rolling k-gram formulation removes the same spans at k-granularity
and is embarrassingly shuffle-parallel, which is the trade the
original paper's distributed follow-ups make too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kgram_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, pos, g): every k-token window, 1-based pos, md5-hex gram key."""
    w = F.split(F.col(text_col), " ")
    npos = F.size(w) - (k - 1)
    pos = F.explode(
        F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("pos")
    sp = docs.select(F.col(id_col), w.alias("w"), pos)
    return sp.select(
        id_col,
        "pos",
        F.md5(F.concat_ws(" ", F.slice("w", F.col("pos"), k))).alias("g"),
    )


def duplicate_spans(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, pos) of every span whose gram repeats, EXCLUDING the first
    occurrence (ordered by (id, pos)). One digest-keyed shuffle."""
    firsts = spans.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(id_col, "pos")).alias("first"),
    )
    return (
        spans.join(firsts.where(F.col("cnt") > 1), "g")
        .where(
            (F.col(id_col) != F.col(f"first.{id_col}"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select(id_col, "pos")
    )


def scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Remove every duplicated k-span (keeping first occurrences).

    -> (id, n_tokens, n_removed, clean_md5): the cleaned text is
    re-joined with single spaces and fingerprinted so the oracle can
    verify byte-exact reconstruction without shipping bodies."""
    dups = duplicate_spans(kgram_spans(docs, id_col, text_col, k), id_col)
    starts = dups.groupBy(id_col).agg(F.collect_set("pos").alias("ps"))
    w = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), w.alias("w")).join(
        starts, id_col, "left"
    )
    ps = F.coalesce(F.col("ps"), F.array().cast("array<int>"))
    # token index i is 0-based in the HOF; span starts are 1-based.
    covered = lambda i: F.exists(
        ps, lambda p: (i + 1 >= p) & (i + 1 < p + F.lit(k))
    )
    kept = F.filter("w", lambda x, i: ~covered(i))
    return base.select(
        id_col,
        F.size("w").cast("long").alias("n_tokens"),
        (F.size("w") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_md5"),
    )
