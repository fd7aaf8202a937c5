"""BPE vocabulary induction — the pair-count / merge-selection step.

One iteration of byte-pair-encoding training (Sennrich et al. 2016,
the tokenizer-training primitive behind GPT/Llama vocabularies): count
adjacent symbol pairs across the corpus, weighted by word frequency,
and rank merge candidates.

Spark-first shape — the classic two-level trick that makes BPE
training corpus-size-independent per iteration:

- **Pairs count over the DISTINCT word table, weighted by frequency**,
  never over raw tokens: one word-keyed shuffle builds the frequency
  table (vocabulary-sized from then on), one pair-keyed shuffle sums
  the weighted pair counts.  At 10^12 documents the vocabulary is
  millions of rows, not trillions — each BPE iteration touches only
  that.
- **Adjacent pairs are substrings, not char-array zips**:
  ``substr(word, i, 2)`` for i in 1..len-1 — no array materialization,
  stays in whole-stage codegen.  The same guarded-sequence discipline
  as contamination.py (Spark's ``sequence`` descends on a negative
  span).
- The ranking window is global but runs over the distinct-PAIR table
  (bounded by alphabet², thousands of rows at any corpus size) — a
  single-partition window over a provably tiny frame, not a scale
  hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """-> (word, freq): whitespace-token frequency table."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """(word, freq) -> (pair, n): adjacent character pairs weighted by
    word frequency — the BPE merge-candidate statistics."""
    starts = F.when(
        F.length("word") >= 2, F.sequence(F.lit(1), F.length("word") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(starts, lambda i: F.col("word").substr(i, F.lit(2)))
    return (
        wf.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def top_merges(pc: DataFrame, k: int = 20) -> DataFrame:
    """Top-k merge candidates, deterministically ranked (count desc,
    pair asc — the tie rule makes both engines pick identical ranks)."""
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        pc.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("rank", "pair", "n")
    )
