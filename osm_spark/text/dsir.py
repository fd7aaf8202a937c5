"""DSIR — Data Selection via Importance Resampling (hashed n-grams).

The training-mix selector from Xie et al. 2023 (arXiv:2302.03169):
score every raw document by the log-likelihood ratio of a TARGET
domain model over a RAW pool model, both cheap bag-of-hashed-ngram
multinomials, then keep documents whose content looks like the
target.  It is the principled replacement for binary quality
classifiers when the goal is "more like Wikipedia/books, less like
the crawl average", and the standard first stage before temperature
sampling in open-data pipelines (DoReMi and friends assume such
importance weights exist).

Spark-first shape:

- Feature hashing caps model state: every token maps to one of
  ``n_buckets`` buckets via the house md5 bit-slice, so BOTH models
  are parameter-sized tables however large the corpus — they
  broadcast, and the per-document score is one explode + broadcast
  join + doc-keyed sum with map-side partials.  No vocabulary
  shuffle at all (contrast the LM trainer, whose bigram table is
  vocabulary-sized).
- House float discipline: each bucket's add-one-smoothed
  ``ln p_target`` and ``ln p_raw`` are floor-quantized to int64 at
  1e-6 INDEPENDENTLY before the subtraction and the per-document
  sum, so the unordered distributed sum is exact integer arithmetic
  and engines can't diverge by a summation order (same contract as
  text/lm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dedup import words

QUANT = 1_000_000
_HEX = "0123456789abcdef"


def hashed_bucket(word, n_buckets: int = 256, salt: str = "dsir") -> Column:
    """Token -> bucket id in [0, n_buckets): first 3 md5 nibbles of
    the salted token, mod n_buckets (md5 bit-slice, the repo's
    engine-portable hash)."""
    c = F.col(word) if isinstance(word, str) else word
    h = F.md5(F.concat(F.lit(f"{salt}|"), c))
    return F.conv(F.substring(h, 1, 3), 16, 10).cast("long") % n_buckets


def hashed_bucket_sql(word: str, n_buckets: int = 256,
                      salt: str = "dsir") -> str:
    """DuckDB twin of :func:`hashed_bucket` (strpos hex chain)."""
    h = f"md5('{salt}|' || {word})"
    terms = [
        f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (2 - i)}"
        for i in range(3)
    ]
    return f"(({' + '.join(terms)}) % {n_buckets})"


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """-> (id, n_tok, score_e6, selected) importance scores.

    ``score_e6 = sum_tokens [ floor(1e6 ln p_t(b)) - floor(1e6 ln
    p_r(b)) ]`` with add-one smoothing over hashed unigram buckets;
    ``p_t`` is trained on rows satisfying ``target_pred``, ``p_r`` on
    ALL rows (the raw pool includes the target — the standard DSIR
    setup where the target is a slice of the crawl).  ``selected``
    is the zero-threshold gate (document looks more target-like than
    pool-average).  Two bucket-sized aggregations train both models;
    the score pass is one explode + one broadcast join + one id-keyed
    integer sum."""
    tok = docs.select(
        F.col(id_col).alias("__id"),
        target_pred.alias("__is_t"),
        F.explode(words(text_col)).alias("__w"),
    ).withColumn("__b", hashed_bucket("__w", n_buckets))

    counts = tok.groupBy("__b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("__is_t").cast("long")).alias("ct"),
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("tr"),
        F.sum(F.col("__is_t").cast("long")).alias("tt"),
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.floor(
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("tt") + n_buckets)
                ) * QUANT
            )
            - F.floor(
                F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("tr") + n_buckets)
                ) * QUANT
            )
        ).cast("long").alias("lam_e6"),
    )
    return (
        tok.join(F.broadcast(lam), "__b")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lam_e6").cast("long").alias("score_e6"),
        )
        .withColumn("selected", F.col("score_e6") > 0)
    )
