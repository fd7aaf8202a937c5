"""Unit tests: corpus bigram-LM perplexity scoring (text/lm.py).

Semantics under test: add-k smoothed bigram probabilities trained on
the corpus itself, per-document summed log-probability with per-term
int64 quantization at 1e-6 (the cross-engine float discipline).
"""

from __future__ import annotations

import math

from osm_spark.text import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigrams_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c"), (2, "x"), (3, "p q")])
    got = sorted(
        (r.doc_id, r.w1, r.w2) for r in lm.bigrams(df).collect()
    )
    # doc 1 -> (a,b),(b,c); doc 2 has no bigram; doc 3 -> (p,q)
    assert got == [(1, "a", "b"), (1, "b", "c"), (3, "p", "q")]


def test_train_counts_roll_up_from_bigram_table(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a c")])
    bg = lm.bigrams(df)
    c12, c1 = lm.train_counts(bg)
    assert {(r.w1, r.w2): r.c12 for r in c12.collect()} == {
        ("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1,
    }
    # context counts are bigram-table rollups: a starts 3 bigrams, b 1
    assert {r.w1: r.c1 for r in c1.collect()} == {"a": 3, "b": 1}


def test_vocab_size_counts_distinct_tokens(spark):
    df = _docs(spark, [(1, "a b b"), (2, "c a")])
    assert lm.vocab_size(df).collect()[0].v == 3


def test_perplexity_matches_closed_form(spark):
    # corpus: "a b" x2 and "a c" x1 -> V=3, c1(a)=3, c12(a,b)=2, c12(a,c)=1
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {r.doc_id: r for r in lm.perplexity(df).collect()}

    def e6(c12, c1, v=3, k=0.5):
        return math.floor(math.log((c12 + k) / (c1 + k * v)) * 1e6)

    assert out[1].n_bigrams == 1 and out[1].logprob_e6 == e6(2, 3)
    assert out[2].logprob_e6 == out[1].logprob_e6
    assert out[3].n_bigrams == 1 and out[3].logprob_e6 == e6(1, 3)
    # the common bigram scores strictly higher than the rare one
    assert out[1].logprob_e6 > out[3].logprob_e6


def test_perplexity_sums_per_term_quantized(spark):
    # one doc with two bigrams: the doc sum is the sum of the two
    # already-quantized terms, not a quantization of the raw sum.
    df = _docs(spark, [(1, "a b c")])
    out = lm.perplexity(df).collect()[0]
    v, k = 3, 0.5
    t1 = math.floor(math.log((1 + k) / (1 + k * v)) * 1e6)  # (a,b)
    t2 = math.floor(math.log((1 + k) / (1 + k * v)) * 1e6)  # (b,c)
    assert out.n_bigrams == 2
    assert out.logprob_e6 == t1 + t2


def test_docs_without_bigrams_not_emitted(spark):
    df = _docs(spark, [(1, "solo"), (2, "a b")])
    ids = {r.doc_id for r in lm.perplexity(df).collect()}
    assert ids == {2}
