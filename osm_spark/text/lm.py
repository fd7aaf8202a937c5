"""Corpus n-gram language-model perplexity scoring (CCNet-style).

The quality filter CCNet / Gopher-class pipelines run after dedup:
train a smoothed n-gram LM on the corpus, score every document's
per-token log-probability, and gate on the resulting perplexity — a
page whose token transitions are globally rare (gibberish, lexical
spam, OCR noise) scores far below well-formed text.  Here the corpus
scores itself (self-perplexity), which is the degenerate single-shard
form of the same operator; a held-out reference corpus would simply
swap the frame the counts are trained on.

Spark-first shape — counts are aggregations, scoring is a join, the
whole thing is built-ins:

- **bigram explode**: one `sequence`+`element_at` projection per doc
  (JVM codegen, no Python), yielding |tokens| rows of (doc, w1, w2).
- **train = two partial-aggregated shuffles**: bigram counts keyed on
  (w1,w2); context counts derived from the (much smaller) bigram-count
  table, never from the raw stream twice.  Vocabulary size is a 1-row
  aggregate broadcast into the scorer — no driver-side collect.
- **score = join back + one doc-keyed shuffle**: each bigram occurrence
  looks up its own count (hot heads like "the" are exactly the skewed
  keys AQE's skew-join split handles), takes
  ``ln((c12 + k) / (c1 + k·V))`` (add-k smoothing, k=0.5), quantizes
  the transcendental per-term to int64 at 1e-6 (house float
  discipline: never SUM raw doubles across engines), and sums per doc.

At 10^12 docs the count tables are vocab-sized (≪ corpus), the bigram
stream is |tokens| narrow rows, and every stage is a hash
aggregate/join on short string keys — the same shape as the exact-dedup
digest shuffle that is already proven out.  Reference anchor: the
per-element packed-id clustered group discipline (paulmach/osm
osmpbf/decode.go scan→group→emit) — one key shuffle, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.text.dedup import words

ADD_K = 0.5
QUANT = 1_000_000


def bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2): every adjacent token pair, in-order, per document."""
    w = words(text_col)
    pos = F.explode(
        F.when(F.size(w) >= 2, F.sequence(F.lit(1), F.size(w) - 1)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("pos")
    b = docs.select(F.col(id_col), w.alias("w"), pos)
    return b.select(
        id_col,
        F.element_at("w", F.col("pos")).alias("w1"),
        F.element_at("w", F.col("pos") + 1).alias("w2"),
    )


def train_counts(bg: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bigram counts, context counts) — context totals roll up from the
    bigram-count table so the raw stream is aggregated exactly once."""
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return c12, c1


def vocab_size(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row (v) frame: distinct token count over the corpus."""
    return (
        docs.select(F.explode(words(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )


def perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = ADD_K,
) -> DataFrame:
    """Score every document against the corpus bigram LM.

    -> (id, n_bigrams, logprob_e6): logprob_e6 is the int64 sum of
    per-bigram ``floor(1e6 · ln P(w2|w1))`` terms under add-k smoothing
    — monotone in perplexity (ppl = exp(-logprob/n)), exact and
    order-independent across engines.  Documents shorter than 2 tokens
    carry no bigrams and are not emitted (nothing to score).
    """
    bg = bigrams(docs, id_col, text_col)
    c12, c1 = train_counts(bg)
    v = vocab_size(docs, text_col)
    p = (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    term_e6 = F.floor(F.log(p) * QUANT).cast("long")
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(term_e6).alias("logprob_e6"),
        )
    )


def collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """PMI collocation mining — the word2vec/phrase-detection
    preprocessing pass: score every adjacent pair by pointwise mutual
    information, keep pairs seen >= min_count times.

    -> (w1, w2, c12, pmi_e6) with
    ``pmi = ln((c12 · T_uni · T_uni) / (T_bi · c1 · c2))`` quantized to
    int64 at 1e-6 (the ln is the only transcendental; the products run
    left-associated in double on both engines).  Same scale shape as
    the LM trainer: every count table is vocabulary-sized, the raw
    stream aggregates exactly once per statistic, and the two corpus
    totals broadcast as 1-row frames."""
    bg = bigrams(docs, id_col, text_col)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    tok = docs.select(F.explode(words(text_col)).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = tok.agg(F.count(F.lit(1)).alias("t_uni")).crossJoin(
        bg.agg(F.count(F.lit(1)).alias("t_bi"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    num = F.col("c12").cast("double") * F.col("t_uni") * F.col("t_uni")
    den = F.col("t_bi").cast("double") * F.col("c1") * F.col("c2")
    return (
        c12.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", F.col("c12").cast("long").alias("c12"),
            F.floor(F.log(num / den) * F.lit(QUANT)).cast("long")
            .alias("pmi_e6"),
        )
    )


def merge_phrases(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """word2phrase application pass: rewrite every document, joining
    each adjacent pair that appears in ``phrases`` (w1, w2) into one
    token ``w1_w2``, greedy left-to-right and non-overlapping — the
    single-pass semantics of word2vec's phrase builder.

    The greedy scan is NOT expressed as a sequential loop: within any
    maximal run of CONSECUTIVE candidate positions, greedy merges land
    on the 1st, 3rd, 5th... positions of the run (a merge at i consumes
    token i+1, un-candidating position i+1 and nothing else), so the
    scan compiles to gaps-and-islands windows — island id =
    pos - row_number() over candidates, merge iff
    (pos - min(pos) over island) is even.  Plan: one pair explode +
    one broadcast semi-join against the phrase table + two windows on
    (id-keyed, in-doc) partitions + one doc-keyed regroup; the rebuild
    is in-row array HOFs over the merge-position set.

    -> (id, n_merges, merged_md5): the rewritten text ships as a
    digest (byte-exact reconstruction proof without moving bodies,
    same convention as substr_dedup)."""
    w = words(text_col)
    pairs = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.concat(
                        F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "pair"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "pair")
    ph = F.broadcast(
        phrases.select(
            F.concat_ws(" ", "w1", "w2").alias("pair")
        ).distinct()
    )
    cand = pairs.join(ph, "pair").select(id_col, "pos")
    w_rn = Window.partitionBy(id_col).orderBy("pos")
    isl = cand.withColumn(
        "island", F.col("pos") - F.row_number().over(w_rn)
    )
    w_isl = Window.partitionBy(id_col, "island")
    merges = (
        isl.withColumn("off", F.col("pos") - F.min("pos").over(w_isl))
        .where(F.col("off") % 2 == 0)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("m"))
    )
    joined = docs.join(merges, id_col, "left").select(
        F.col(id_col),
        w.alias("w"),
        F.coalesce("m", F.array().cast("array<int>")).alias("m"),
    )
    out_tok = F.transform(
        F.sequence(F.lit(1), F.size("w")),
        lambda i: F.when(
            F.array_contains("m", i.cast("int")),
            F.concat(
                F.element_at("w", i), F.lit("_"), F.element_at("w", i + 1)
            ),
        ).otherwise(
            F.when(
                F.array_contains("m", (i - 1).cast("int")), F.lit(None)
            ).otherwise(F.element_at("w", i))
        ),
    )
    return joined.select(
        id_col,
        F.size("m").cast("long").alias("n_merges"),
        F.md5(
            F.encode(
                F.array_join(F.filter(out_tok, lambda t: t.isNotNull()), " "),
                "UTF-8",
            )
        ).alias("merged_md5"),
    )
