"""text/vocab.py — BPE pair-count / merge-selection semantics."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from osm_spark.text import vocab as vb


def test_word_freq(spark):
    docs = spark.createDataFrame([("ab ab cd",), ("ab x",)], "text string")
    wf = {r.word: r.freq for r in vb.word_freq(docs, "text").collect()}
    assert wf == {"ab": 3, "cd": 1, "x": 1}


def test_pair_counts_weighted_by_freq(spark):
    wf = spark.createDataFrame(
        [("aba", 2), ("ab", 3), ("x", 5)], "word string, freq long"
    )
    pc = {r.pair: r.n for r in vb.pair_counts(wf).collect()}
    # "aba" -> ab, ba (x2 each); "ab" -> ab (x3); "x" -> nothing
    assert pc == {"ab": 5, "ba": 2}


def test_top_merges_deterministic_ties(spark):
    pc = spark.createDataFrame(
        [("zz", 7), ("aa", 7), ("mm", 9)], "pair string, n long"
    )
    got = [(r.rank, r.pair, r.n) for r in vb.top_merges(pc, k=2).collect()]
    # count desc, then pair asc breaks the 7-7 tie
    assert sorted(got) == [(1, "mm", 9), (2, "aa", 7)]
