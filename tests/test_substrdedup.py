"""Unit tests: exact substring (k-token span) deduplication.

Semantics under test (text/substrdedup.py, Lee et al. 2022 span dedup):
every k-token window whose exact text repeats anywhere in the corpus is
scrubbed from all occurrences EXCEPT the first, ordered by (doc_id, pos).
"""

from __future__ import annotations

import hashlib

from osm_spark.text import substrdedup as sd


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kgram_spans_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c"), (3, "x")])
    got = sd.kgram_spans(df, k=5).collect()
    # doc 1: 6 tokens -> spans at pos 1,2; docs 2,3 shorter than k -> none
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    assert by_doc == {1: [1, 2]}
    # gram key is md5 of the space-joined window
    g = {r.pos: r.g for r in got if r.doc_id == 1}
    assert g[1] == _md5("a b c d e")
    assert g[2] == _md5("b c d e f")


def test_first_occurrence_kept_cross_doc(spark):
    # same 5-token license line in both docs; doc 1 is first by (id,pos)
    df = _docs(
        spark,
        [
            (1, "all rights reserved by law"),
            (2, "novel text here all rights reserved by law"),
        ],
    )
    out = {r.doc_id: r for r in sd.scrub(df, k=5).collect()}
    assert out[1].n_removed == 0
    assert out[1].clean_md5 == _md5("all rights reserved by law")
    # doc 2: the span at pos 4 is scrubbed (5 tokens), prefix kept
    assert out[2].n_tokens == 8
    assert out[2].n_removed == 5
    assert out[2].clean_md5 == _md5("novel text here")


def test_within_doc_repeat_and_overlap_coverage(spark):
    # "a b c d e" repeats inside one doc with one token between;
    # first occurrence (pos 1) kept, second (pos 7) scrubbed.
    df = _docs(spark, [(1, "a b c d e X a b c d e")])
    out = sd.scrub(df, k=5).collect()[0]
    assert out.n_tokens == 11
    assert out.n_removed == 5
    assert out.clean_md5 == _md5("a b c d e X")


def test_fully_scrubbed_doc_hashes_empty_string(spark):
    # doc 2 is exactly a duplicate window -> everything removed;
    # md5('') (not NULL) so the fingerprint stays total.
    df = _docs(
        spark,
        [(1, "p q r s t u"), (2, "p q r s t")],
    )
    out = {r.doc_id: r for r in sd.scrub(df, k=5).collect()}
    assert out[2].n_removed == 5
    assert out[2].clean_md5 == _md5("")
    # doc 1 holds both first occurrences -> untouched
    assert out[1].n_removed == 0


def test_no_duplicates_identity(spark):
    df = _docs(spark, [(1, "one two three four five six"), (2, "a b c")])
    out = {r.doc_id: r for r in sd.scrub(df, k=5).collect()}
    assert out[1].n_removed == 0
    assert out[1].clean_md5 == _md5("one two three four five six")
    # shorter-than-k doc passes through whole
    assert out[2].n_tokens == 3 and out[2].n_removed == 0
    assert out[2].clean_md5 == _md5("a b c")


def test_overlapping_dup_spans_union_coverage(spark):
    # doc 2 repeats a 6-token run from doc 1 -> two overlapping dup
    # 5-spans (pos 1 and 2) whose union covers all 6 tokens.
    df = _docs(
        spark,
        [
            (1, "a b c d e f tail text beyond"),
            (2, "a b c d e f unique suffix here now"),
        ],
    )
    out = {r.doc_id: r for r in sd.scrub(df, k=5).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == 6
    assert out[2].clean_md5 == _md5("unique suffix here now")
