"""Train/eval contamination check (benchmark decontamination).

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style
n-gram decontamination): an eval document is contaminated when it
shares a word n-gram with any training document.  The reference's
analogue is its duplicate-element detection across history snapshots;
here the corpus-level form every training pipeline runs before
reporting benchmark numbers.

Spark-first shape:

- **Shingle inner join, never all-pairs**: both sides explode to
  DISTINCT (doc, shingle) rows; the train side collapses to one row
  per shingle first (shingle-keyed shuffle ~ corpus token count), and
  the eval side — always orders of magnitude smaller — joins into it.
  At 10^12 train docs the join key would be ``xxhash64(shingle)``
  (8-byte exchange rows instead of strings); the string key is kept
  here so Spark and DuckDB join on identical values.
- **Short docs stay in the report**: documents with fewer than n words
  emit zero shingles; a final left join from the eval id set restores
  them with ``n_shingles = 0`` (a decontamination report must cover
  every eval doc, not just the shingled ones).
- Integer-exact: counts and a flag; the contamination ratio is left to
  the consumer (int/int division is the only float here and both
  engines would agree anyway, but the counts are the auditable fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_rows(docs: DataFrame, id_col: str, text_col: str,
                 n: int = 8) -> DataFrame:
    """-> DISTINCT (doc, shingle) word n-grams.

    ``sequence`` is guarded by a length check — Spark's ``sequence(0,
    negative)`` generates a DESCENDING range rather than an empty one,
    so an unguarded short doc would explode into garbage slices."""
    w = F.split(F.col(text_col), " ")
    starts = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(starts, lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def contamination_report(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-eval-doc contamination report.

    Columns: doc_id, n_shingles (distinct n-grams in the eval doc),
    n_hit (of those, how many appear anywhere in train), first_hit
    (lexicographically-first hit — the auditable example), contaminated
    (n_hit >= min_hits)."""
    ev = shingle_rows(eval_docs, id_col, text_col, n)
    tr = shingle_rows(train_docs, id_col, text_col, n).select("shingle").distinct()
    base = ev.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        ev.join(tr, "shingle")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("shingle").alias("first_hit"),
        )
    )
    all_ids = eval_docs.select(F.col(id_col).alias("doc"))
    return (
        all_ids.join(base, "doc", "left")
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.col("first_hit"),
            (F.coalesce("n_hit", F.lit(0)) >= min_hits).cast("int").alias("contaminated"),
        )
    )
