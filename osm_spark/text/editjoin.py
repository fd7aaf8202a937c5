"""Edit-distance similarity join — exact recall, never all-pairs.

URL/title near-duplicate detection (typosquatting, tracking-parameter
variants, CDN mirrors) needs ALL string pairs within edit distance d.
MinHash/SimHash are Jaccard machinery — wrong metric for short keys
where one character substitution matters.  The scalable exact shape
is the q-gram prefix-filtered join (AllPairs/PPJoin family):

1. Each string's DISTINCT q-gram set A loses at most q grams per
   edit, so strings within distance d share >= max(|A|,|B|) - d*q
   grams — in particular, AT LEAST ONE gram among each string's
   (d*q + 1) rarest grams under a GLOBAL (frequency, gram) order
   (take A's prefix P_A of its |A| - (|A| - d*q) + 1 = d*q + 1
   smallest elements: if A∩B avoided P_A entirely, A∩B would have to
   fit inside the |A| - (d*q + 1) largest, contradicting
   |A∩B| >= |A| - d*q).
2. Joining on PREFIX grams only is therefore complete — and kills
   the hot-gram blowup: every string shares the structural grams of
   its template ('page-', 'http'), but those are the most FREQUENT
   grams, excluded from every prefix.  Bucket sizes track the rare
   tail of the gram distribution, never the corpus.
3. Candidates verify with the exact unit-cost Levenshtein DP
   (`F.levenshtein`, JVM-side; DuckDB's levenshtein() is the same
   classic DP, so the oracle can brute-force all pairs index-free).

Cost: one gram-frequency aggregation (gram-vocabulary-sized,
broadcast), one per-string rank window, one equi-join on prefix
grams, one verify projection.  No similarity join in the plan ever
compares strings that share zero rare grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def qgrams(s, q: int = 2) -> Column:
    """Distinct q-grams of a string column (array<string>); strings
    shorter than q yield their whole self as the single gram."""
    c = F.col(s) if isinstance(s, str) else s
    n = F.length(c)
    ks = F.when(n >= q, F.sequence(F.lit(1), n - (q - 1))).otherwise(
        F.array(F.lit(1))
    )
    return F.array_distinct(
        F.transform(ks, lambda i: c.substr(i, F.lit(q)))
    )


def edit_distance_join(
    strs: DataFrame,
    id_col: str = "sid",
    str_col: str = "s",
    d: int = 2,
    q: int = 2,
) -> DataFrame:
    """-> (a, b, dist): all id pairs (a < b) with
    levenshtein(s_a, s_b) <= d.  Exact recall via the prefix filter
    (module header); requires length >= q * (d + 1) for the >= 1
    shared-prefix-gram guarantee — shorter strings join on their full
    gram set (prefix length covers it)."""
    base = strs.select(
        F.col(id_col).alias("sid"), F.col(str_col).alias("s")
    )
    g = base.select("sid", "s", F.explode(qgrams("s", q)).alias("g"))
    freq = g.groupBy("g").agg(F.count(F.lit(1)).alias("gf"))
    ranked = (
        g.join(F.broadcast(freq), "g")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("sid").orderBy("gf", "g")
            ),
        )
        .where(F.col("rk") <= d * q + 1)
        .select("sid", "s", "g")
    )
    a = ranked.select(
        F.col("sid").alias("a"), F.col("s").alias("sa"), "g"
    )
    b = ranked.select(
        F.col("sid").alias("b"), F.col("s").alias("sb"), "g"
    )
    cand = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.levenshtein("sa", "sb").alias("dist"),
    ).where(F.col("dist") <= d)
