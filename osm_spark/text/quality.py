"""Text quality / language-id / token metrics over document tables.

All pure column math (split/filter/length) so the 100 TB plan is a
single narrow scan-project; every metric has an exact DuckDB-expressible
twin for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dedup import words

STOPWORDS = ["the", "a", "of", "and", "to"]

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order


def n_tokens(text) -> Column:
    return F.size(words(text))


def char_count(text, ch: str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit("")))


def stopword_count(text, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    arr = F.array(*[F.lit(s) for s in sw])
    return F.size(F.filter(words(text), lambda w: F.array_contains(arr, w)))


def quality_metrics(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc counts + a composite score quantized to 1e-6.

    score = 0.5*min(1, tokens/100) + 0.3*stop_ratio*5 + 0.2*(1 - punct_ratio)
    """
    nt = n_tokens(text_col)
    punct = char_count(text_col, ".") + char_count(text_col, ",")
    stops = stopword_count(text_col)
    nchars = F.length(text_col)
    punct_ratio = punct.cast("double") / nchars.cast("double")
    stop_ratio = stops.cast("double") / nt.cast("double")
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), nt.cast("double") / 100.0)
        + F.lit(0.3) * stop_ratio * 5.0
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        F.col(id_col),
        nt.alias("n_tok"),
        nchars.alias("n_chars"),
        punct.alias("n_punct"),
        stops.alias("n_stop"),
        F.floor(score * 1e6).alias("score_e6"),
    )


def lang_scores(text) -> dict[str, Column]:
    w = words(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(w, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language heuristic: argmax marker count with the
    fixed LANG_ORDER tie-break; 'und' when every score is zero."""
    sc = lang_scores(text_col)
    pred = F.lit("und")
    # build reversed CASE: first langs win ties
    for lang in reversed(LANG_ORDER):
        others_before = LANG_ORDER[: LANG_ORDER.index(lang)]
        cond = sc[lang] > 0
        for o in others_before:
            cond = cond & (sc[lang] > sc[o])
        for o in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            cond = cond & (sc[lang] >= sc[o])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    cols = [sc[lang].alias(f"c_{lang}") for lang in LANG_ORDER]
    return docs.select(F.col(id_col), pred.alias("pred_lang"), *cols)


def fingerprints(docs: DataFrame, id_col: str, text_col: str,
                 gram: int = 5, buckets: int = 4) -> DataFrame:
    """Winnowing-style document fingerprints: md5 of word ``gram``-grams,
    min digest per position bucket (pos % buckets) -> up to ``buckets``
    fingerprints per doc."""
    from osm_spark.text.dedup import shingles

    sh = docs.select(
        F.col(id_col), F.posexplode(shingles(text_col, gram)).alias("pos", "g")
    )
    return (
        sh.select(
            F.col(id_col),
            (F.col("pos") % buckets).alias("bucket"),
            F.md5("g").alias("h"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.min("h").alias("fp"))
    )


# BPE-ish pre-tokenizer (GPT-2-style word/number/punct pieces with an
# optional leading space), restricted to ASCII classes and no
# lookarounds so Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_tokens(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))


def n_bpe_tokens(text) -> Column:
    return F.size(bpe_tokens(text))
