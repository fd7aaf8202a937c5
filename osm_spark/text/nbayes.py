"""Multinomial Naive Bayes text classification, distributed.

The train-a-classifier-on-the-corpus operator LLM data pipelines use
for quality/domain gating (the fastText wiki-vs-crawl classifier in
CCNet/Dolma-class pipelines): class-conditional unigram models with
add-k smoothing, trained and applied entirely as aggregations + joins.

Spark-first shape, sized for 10^12 documents:

- **Train = two vocab-sized shuffles** (same discipline as text/lm.py):
  (class, word) counts from one explode; class totals roll up from the
  already-aggregated count table; vocabulary size and class priors are
  1-row / |classes|-row aggregates.  Model size is |vocab|·|classes| —
  table-sized, never corpus-sized.
- **Score = tf-weighted lookup join**: documents reduce to (doc, word,
  tf) rows once; each row joins its |classes| smoothed log-probs (the
  model side is the small side — broadcast or AQE's choice) and
  contributes tf · floor(1e6·ln P(w|c)) — quantizing the transcendental
  BEFORE the weighted sum keeps both engines integer-exact (house float
  discipline).  Unseen (word, class) pairs take the smoothing floor via
  a left join + coalesce.
- **Argmax = per-doc window over |classes| rows** (bounded group, no
  salt needed) with the (score DESC, class ASC) total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.text.dedup import words

ADD_K = 0.5
QUANT = 1_000_000


def _ln_e6(x) -> F.Column:
    return F.floor(F.log(x) * QUANT).cast("long")


def train(
    docs: DataFrame,
    class_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (word_logp, class_model, vocab): word_logp is (class, word,
    logp_e6); class_model is (class, prior_e6, floor_e6) where floor_e6
    is the unseen-word smoothed log-prob for that class; vocab is the
    1-row (v) frame.  All log terms are floor(1e6·ln)."""
    tok = docs.select(
        F.col(class_col).alias("class"),
        F.explode(words(text_col)).alias("word"),
    )
    cw = tok.groupBy("class", "word").agg(F.count(F.lit(1)).alias("c_wc"))
    ctot = cw.groupBy("class").agg(F.sum("c_wc").alias("c_c"))
    vocab = tok.agg(F.countDistinct("word").alias("v"))
    n_docs = docs.count()
    priors = docs.groupBy(F.col(class_col).alias("class")).agg(
        _ln_e6(F.count(F.lit(1)) / F.lit(float(n_docs))).alias("prior_e6")
    )
    denom = F.col("c_c") + F.lit(ADD_K) * F.col("v")
    word_logp = (
        cw.join(ctot, "class")
        .crossJoin(F.broadcast(vocab))
        .select(
            "class", "word",
            _ln_e6((F.col("c_wc") + F.lit(ADD_K)) / denom).alias("logp_e6"),
        )
    )
    class_model = (
        ctot.crossJoin(F.broadcast(vocab))
        .select("class", _ln_e6(F.lit(ADD_K) / denom).alias("floor_e6"))
        .join(priors, "class")
        .select("class", "prior_e6", "floor_e6")
    )
    return word_logp, class_model, vocab


def classify(
    docs: DataFrame,
    word_logp: DataFrame,
    class_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, pred, score_e6): argmax class per document under the
    trained model, ties broken by class ASC.  (split(' ') always yields
    at least one token — the empty string — so every document scores.)"""
    tf = (
        docs.select(F.col(id_col), F.explode(words(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # every (doc-word, class) pair: model miss -> smoothing floor
    pairs = tf.crossJoin(F.broadcast(class_model.select("class", "floor_e6")))
    terms = pairs.join(word_logp, ["class", "word"], "left").select(
        id_col, "class",
        (F.col("tf") * F.coalesce("logp_e6", "floor_e6")).alias("term_e6"),
    )
    scores = (
        terms.groupBy(id_col, "class")
        .agg(F.sum("term_e6").alias("ll_e6"))
        .join(F.broadcast(class_model.select("class", "prior_e6")), "class")
        .select(
            id_col, "class",
            (F.col("ll_e6") + F.col("prior_e6")).cast("long").alias("score_e6"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_e6").desc(), F.col("class").asc()
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("class").alias("pred"), "score_e6")
    )
