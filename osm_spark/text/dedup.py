"""Deduplication operators over document tables.

Web-scale dedup suite (engine extension beyond the reference; sits on the
same Spark-first discipline — column HOFs, no per-row Python):

- exact_dedup:    md5(text) hash-groupBy. One shuffle keyed by digest.
- minhash:        word-shingle MinHash signatures. The "hash family" is
  ``min(md5(i || '|' || shingle))`` for i in 0..k-1 — md5 is available
  and bit-identical in every engine, and MinHash only needs a family of
  independent total orders, not numeric hashes, so min-over-hex-strings
  works and is trivially cross-checkable.
- lsh_candidates: band signatures -> self-join on (band_idx, band_key).
  At 10^12 docs this is THE scalable near-dup plan: shuffle volume is
  |docs| x bands, hot buckets split by AQE skew join.
- ngram_jaccard:  exact shingle-set jaccard for candidate verification.
- simhash:        16-bit simhash from md5-nibble token hashes.

All shingling/hashing is Spark column HOFs (split/transform/aggregate) —
JVM-side, no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (1-based element_at)."""
    w = words(text)
    k = F.size(w) - (n - 1)
    mk = lambda i: F.concat_ws(
        " ", *[F.element_at(w, i + j) for j in range(n)]
    )
    return F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), mk)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(text: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (lists are 1-based there too)."""
    w = f"string_split({text}, ' ')"
    joined = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(range(1, len({w}) - {n - 1} + 1), i -> {joined}) "
        f"ELSE [] END"
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5 digest -> (digest, n, keeper id)."""
    return (
        docs.select(F.md5(text_col).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_id"))
    )


def minhash_signature(docs: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """(id, sig_0..sig_{k-1}) — slot i's hash is an 8-hex-char (32-bit)
    slice of md5((i//4)|shingle): one md5 digest feeds FOUR signature
    slots, and shingles are deduped per doc before hashing (min over a
    set equals min over the multiset). ceil(k/4) md5 calls per DISTINCT
    shingle instead of k per occurrence — measured 49s -> single-digit
    seconds on the sf0.1 near-dup pipeline. Hex slices compare
    lexicographically per value (fixed-width lowercase hex), and DuckDB
    reproduces them byte-identically with substr(md5(...))."""
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col))).alias("sh")
    )
    groups = {
        g: F.md5(F.concat(F.lit(f"{g}|"), F.col("sh")))
        for g in range((k + 3) // 4)
    }
    aggs = [
        F.min(F.substring(groups[i // 4], (i % 4) * 8 + 1, 8)).alias(f"sig_{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sig: DataFrame, id_col: str, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature, self-join on band key -> candidate pairs a<b.

    Plan: explode to |docs| x bands rows, shuffle on (band_idx, key),
    per-bucket pair generation via self-join. Hot buckets (boilerplate
    text) are the skew risk — AQE skew join splits them.
    """
    left = band_frame(sig, id_col, "a", k, rows_per_band)
    right = band_frame(sig, id_col, "b", k, rows_per_band)
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def band_frame(
    sig: DataFrame, id_col: str, out: str, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Project a minhash signature frame to its banded form
    ``(out, band, band_key)`` — k/rows_per_band rows per doc."""
    frames = []
    for b in range(k // rows_per_band):
        key = F.concat_ws(
            "|",
            *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
        )
        frames.append(
            sig.select(
                F.col(id_col).alias(out), F.lit(b).alias("band"),
                key.alias("band_key"),
            )
        )
    allb = frames[0]
    for f in frames[1:]:
        allb = allb.unionByName(f)
    return allb


def lsh_candidates_cross(
    sig_a: DataFrame,
    sig_b: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    rows_per_band: int = 2,
    broadcast_a: bool = False,
) -> DataFrame:
    """Cross-corpus LSH: candidate (a, b) pairs where a document of
    corpus A shares a band key with a document of corpus B — the fuzzy
    train/eval decontamination join.  Never all-pairs: one equi-join
    on (band, band_key).  Set ``broadcast_a`` when corpus A (the eval
    benchmark, typically thousands of docs against a trillion-doc
    train side) fits in a broadcast — the join then runs map-side with
    no shuffle of the big corpus."""
    a = band_frame(sig_a, id_col, "a", k, rows_per_band)
    b = band_frame(sig_b, id_col, "b", k, rows_per_band)
    if broadcast_a:
        a = F.broadcast(a)
    return a.join(b, ["band", "band_key"]).select("a", "b").distinct()


def pair_jaccard_cross(
    pairs: DataFrame, sh_a: DataFrame, sh_b: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact distinct-shingle jaccard for cross-corpus (a, b) pairs;
    ``sh_a``/``sh_b`` are (id, sh array) frames for each side."""
    a = sh_a.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh_b.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
        )
    )


def pair_jaccard(
    docs: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Exact distinct-shingle jaccard for (a, b) pairs -> inter/union.
    Pass a cached ``shingle_df`` (id, sh array) to avoid re-shingling
    the corpus for each side of the pair join."""
    sh = shingle_df
    if sh is None:
        sh = docs.select(
            F.col(id_col),
            F.array_distinct(shingles(text_col)).alias("sh"),
        )
    return pair_jaccard_cross(pairs, sh, sh, id_col)


def _hexval(ch: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash16(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash: per token take 4 md5 hex nibbles (16 bits); each
    bit votes +1/-1 weighted by token multiplicity; simhash bit = sign."""
    tok = docs.select(F.col(id_col), F.explode(words(text_col)).alias("t"))
    h = F.md5("t")
    nib = [_hexval(F.substring(h, i + 1, 1)) for i in range(4)]
    bit_aggs = []
    for b in range(16):
        bit = F.floor(nib[b // 4] / (1 << (b % 4))) % 2
        bit_aggs.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    votes = tok.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.alias("simhash"))


def char_shingles(text, n: int = 4) -> Column:
    """Distinct character n-grams as array<string> (1-based positions,
    mirrors shingles() word form)."""
    c = F.col(text) if isinstance(text, str) else text
    k = F.length(c) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k), lambda i: c.substr(i, F.lit(n))
    )
    return F.array_distinct(
        F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))
    )


def char_shingles_sql(text: str, n: int = 4) -> str:
    """DuckDB twin of :func:`char_shingles` (range() end-exclusive)."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({text}) - {n - 1}, 0) + 1), "
        f"i -> substr({text}, i, {n})))"
    )


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 4, block_len: int = 32, max_block: int | None = None,
) -> DataFrame:
    """Blocked exact character-n-gram Jaccard with OVERLAPPING length
    buckets: each doc emits keys {blk, blk+1} (blk = floor(len/32)), so
    near-dups whose lengths straddle a bucket boundary (63 vs 65 chars)
    still meet. A pair is counted under exactly one key —
    key == greatest(blk_a, blk_b) — so no pair is double-generated.

    ``max_block`` is the explicit scale guard: keys whose member count
    exceeds it are dropped from candidate generation (deterministic, and
    mirrored in the oracle — no silent truncation: pairs from dropped
    keys simply don't appear; discovery inside hot blocks belongs to
    minhash_lsh, this operator is the exact verify stage).

    The inter count runs as an exploded (key, gram) equi-join — all JVM,
    AQE splits hot grams. Returns (a, b, inter, uni)."""
    d = docs.select(
        F.col(id_col).alias("_id"),
        F.floor(F.length(text_col) / block_len).alias("blk"),
        char_shingles(text_col, n).alias("sh"),
    )
    keyed = d.select(
        "_id", "blk", F.explode(F.array(F.col("blk"), F.col("blk") + 1)).alias("key")
    )
    if max_block is not None:
        ok = (
            keyed.groupBy("key")
            .agg(F.count("*").alias("_kn"))
            .where(F.col("_kn") <= max_block)
            .select("key")
        )
        keyed = keyed.join(F.broadcast(ok), "key")
    sizes = d.select("_id", F.size("sh").alias("ns"))
    canonical = F.col("key") == F.greatest(F.col("l.blk"), F.col("r.blk"))
    cand = (
        keyed.alias("l")
        .join(keyed.alias("r"), "key")
        .where((F.col("l._id") < F.col("r._id")) & canonical)
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
    )
    sh = keyed.join(
        d.select("_id", F.explode("sh").alias("g")), "_id"
    ).select("_id", "blk", "key", "g")
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), ["key", "g"])
        .where(
            (F.col("x._id") < F.col("y._id"))
            & (F.col("key") == F.greatest(F.col("x.blk"), F.col("y.blk")))
        )
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        cand.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("ns", "nsa"), "a")
        .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("ns", "nsb"), "b")
        .select(
            "a",
            "b",
            F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
            (F.col("nsa") + F.col("nsb") - F.coalesce("inter", F.lit(0)))
            .cast("long")
            .alias("uni"),
        )
    )


def simhash60(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash (15 md5 hex nibbles per token; 60 not 64 so the
    value stays inside a signed BIGINT in every engine). Each bit votes
    +1/-1 weighted by token multiplicity; simhash bit = sign. All
    column HOFs — one explode + one 60-sum groupBy."""
    tok = docs.select(F.col(id_col), F.explode(words(text_col)).alias("t"))
    # project the digest and nibbles to NAMED columns first: referencing
    # the md5/substr subtree from 60 aggregate expressions re-inlines it
    # per use (codegen duplication; measured ~15s -> ~3s here)
    tok = tok.select(id_col, F.md5("t").alias("_h"))
    tok = tok.select(
        id_col,
        *[
            _hexval(F.substring("_h", i + 1, 1)).alias(f"_n{i}")
            for i in range(15)
        ],
    )
    bit_aggs = []
    for b in range(60):
        bit = F.floor(F.col(f"_n{b // 4}") / (1 << (b % 4))) % 2
        bit_aggs.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    votes = tok.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for b in range(60):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash60_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`simhash60` (returns a full SELECT)."""
    nib = lambda i: (
        f"(strpos('0123456789abcdef', substr(md5(t), {i + 1}, 1)) - 1)"
    )
    sums = ",\n    ".join(
        f"sum((CAST(floor({nib(b // 4)} / {1 << (b % 4)}) AS BIGINT) % 2) * 2 - 1)"
        f" AS v{b}"
        for b in range(60)
    )
    val = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(60)
    )
    return f"""
    SELECT {id_col}, CAST({val} AS BIGINT) AS simhash FROM (
      SELECT {id_col}, {sums}
      FROM (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t
            FROM {table})
      GROUP BY {id_col})
    """


def simhash_neardup_pairs(
    sim: DataFrame, id_col: str = "doc_id", sim_col: str = "simhash",
    n_bands: int = 4, band_bits: int = 15, max_hamming: int = 12,
) -> DataFrame:
    """Hamming-banded near-dup join over SimHash values: by pigeonhole,
    any pair within ``n_bands - 1`` differing bands shares at least one
    exact band, so banding the 60 bits into 4 x 15 finds every pair with
    hamming <= 3 guaranteed (and most up to max_hamming in practice);
    candidates verify with an exact popcount. Shuffle volume is
    |docs| x n_bands band keys — never all-pairs. Returns
    (a, b, hamming <= max_hamming).

    Bands come from ONE explode over the sim table, not a per-band
    union: the union form re-evaluated the whole upstream simhash
    aggregation once per band per join side (measured 24 scans / 32
    exchanges in the plan). Callers should still persist ``sim`` —
    the self-join consumes the explode twice."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                (
                    F.shiftrightunsigned(F.col(sim_col), band_bits * k)
                    % (1 << band_bits)
                ).alias("band_key"),
            )
            for k in range(n_bands)
        ]
    )
    allb = sim.select(
        F.col(id_col), F.col(sim_col), F.explode(band_structs).alias("_b")
    ).select(
        id_col, sim_col, F.col("_b.band").alias("band"),
        F.col("_b.band_key").alias("band_key"),
    )
    left = allb.select(
        F.col(id_col).alias("a"), "band", "band_key",
        F.col(sim_col).alias("sim_a"),
    )
    right = allb.select(
        F.col(id_col).alias("b"), "band", "band_key",
        F.col(sim_col).alias("sim_b"),
    )
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
