"""Exact set-similarity join (Jaccard >= tau) — PPJoin prefix filter.

MinHash-LSH (text/dedup.py) finds near-duplicate candidates
PROBABILISTICALLY — recall < 1 by construction.  Compliance-grade
dedup ("find EVERY pair above the threshold") needs the exact join,
and the scalable exact shape is the AllPairs/PPJoin prefix filter:

Under one GLOBAL total order over tokens (rarest first), if
J(A, B) >= tau then |A ∩ B| >= tau·max(|A|,|B|), and the SMALLEST
common token must lie within the first |X| - ceil(tau·|X|) + 1
tokens of EACH side X (were it later, fewer than tau·|X| of X's
tokens would remain at or after it, yet every common token lies at
or after the smallest one).  So joining only on PREFIX tokens —
p = |X| - ceil(tau·|X|) + 1 per set — is complete, and because the
global order puts FREQUENT tokens last, stopword-class tokens never
enter a prefix: bucket sizes track rare tokens, the same skew
armor as text/editjoin.py.

Candidates then verify with the exact integer Jaccard test
(inter · 1e6 >= tau_e6 · union, no floats).  One token-frequency
aggregation (vocab-sized, broadcast), one per-set rank window, one
prefix-token equi-join, one array-intersect verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_join(
    sets: DataFrame,
    id_col: str = "sid",
    set_col: str = "toks",
    tau_e6: int = 800_000,
) -> DataFrame:
    """-> (a, b, inter, uni, jacc_e6): all id pairs (a < b) with
    exact Jaccard >= tau_e6/1e6 over the array<string> ``set_col``
    (elements assumed distinct per row).  The verify carries both
    token arrays through the candidate join — right at corpus scale
    when sets are document signatures (bounded); join back by id
    instead if sets are megabyte-sized."""
    base = sets.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(F.col(set_col)).alias("toks"),
    )
    tok = base.select("sid", F.explode("toks").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
    ranked = (
        tok.join(F.broadcast(freq), "t")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("sid").orderBy("tf", "t")
            ),
        )
        .join(
            base.select(
                F.col("sid"), F.size("toks").alias("n")
            ),
            "sid",
        )
        # prefix length |X| - ceil(tau|X|) + 1
        .where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.col("n") * tau_e6 / 1_000_000) + 1
        )
        .select("sid", "t")
    )
    a = ranked.select(F.col("sid").alias("a"), "t")
    b = ranked.select(F.col("sid").alias("b"), "t")
    cand = (
        a.join(b, "t").where(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    la = base.select(F.col("sid").alias("a"), F.col("toks").alias("ta"))
    lb = base.select(F.col("sid").alias("b"), F.col("toks").alias("tb"))
    v = (
        cand.join(la, "a").join(lb, "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("ta", "tb")).cast("long")
            .alias("inter"),
            (F.size("ta") + F.size("tb")).cast("long").alias("ns"),
        )
        .select(
            "a", "b", "inter",
            (F.col("ns") - F.col("inter")).alias("uni"),
        )
    )
    return v.where(
        F.col("inter") * 1_000_000 >= tau_e6 * F.col("uni")
    ).select(
        "a", "b", "inter", "uni",
        # floor of the double ratio, not a cast: Spark casts truncate
        # while DuckDB casts ROUND — floor() agrees everywhere
        F.floor(F.col("inter") * F.lit(1_000_000.0) / F.col("uni"))
        .cast("long").alias("jacc_e6"),
    )
