"""Distributed Bloom filter as a TABLE of bitmap words — the
seen-set primitive a multi-crawl pipeline uses to skip already-ingested
urls without materializing the full key set per executor.

Spark-first shapes:

- **Build**: each key explodes into k bit positions (md5-derived — the
  only hash both engines share byte-for-byte, same policy as the
  MinHash/SimHash operators in text/dedup.py), positions fold into
  32-bit words with a `bit_or` aggregation — ONE shuffle whose output
  is at most m/32 rows regardless of corpus size.
- **Probe**: the word table is parameter-sized (m/32 rows), so it
  BROADCASTS; each probe key checks its k (word, mask) pairs against
  the broadcast map and is a member iff all k bits are set.  The probe
  side takes one doc-keyed aggregation.

No false negatives, deterministic false positives: bit positions are a
pure function of (key, j), so Spark and the DuckDB oracle agree on
every probe — including which keys false-positive.

Hashing: position j of key = first 5 hex chars of ``md5(j || '|' ||
key)`` as an integer (20 bits), mod m.  Spark computes it with
``conv(hex, 16, 10)``; the SQL twin reproduces the same value with a
nibble-weighted sum (`strpos` over the hex alphabet) — different
mechanism, identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 16     # filter size (bits)
K_HASHES = 4
WORD_BITS = 32       # 32-bit words inside BIGINT: shifts never overflow


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def bit_position(key, j: int, m_bits: int = M_BITS) -> Column:
    """Deterministic bit position j for a key: 20 md5 bits mod m."""
    h = F.md5(F.concat(F.lit(f"{j}|"), _c(key)))
    return (F.conv(F.substring(h, 1, 5), 16, 10).cast("long") % m_bits)


def bit_position_sql(key_sql: str, j: int, m_bits: int = M_BITS) -> str:
    """DuckDB twin of :func:`bit_position` (nibble-weighted sum)."""
    h = f"md5('{j}|' || {key_sql})"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (4 - i)}"
        for i in range(5)
    )
    return f"(({terms}) % {m_bits})"


def bloom_build(keys: DataFrame, key_col, m_bits: int = M_BITS,
                k: int = K_HASHES) -> DataFrame:
    """keys -> bitmap table (word: long index, bits: long with 32 used
    bits).  One explode + one word-keyed bit_or aggregation."""
    pos = keys.select(
        F.explode(
            F.array(*[bit_position(key_col, j, m_bits) for j in range(k)])
        ).alias("bit")
    )
    return (
        pos.select(
            F.floor(F.col("bit") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, CAST(bit % {WORD_BITS} AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(probes: DataFrame, key_col, bitmap: DataFrame,
                m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """Adds ``in_bloom`` (long 0/1) per DISTINCT probe row: 1 iff every
    one of the key's k bits is set.  The bitmap broadcasts (<= m/32
    rows); the probe side shuffles once on its own columns for the
    all-bits aggregation (duplicate probe rows collapse to one output
    row — the all-bits check counts its own rows, so duplicates can
    never manufacture a false negative)."""
    checks = probes.select(
        *probes.columns,
        F.posexplode(
            F.array(*[bit_position(key_col, j, m_bits) for j in range(k)])
        ).alias("j", "bit"),
    ).select(
        *probes.columns,
        F.floor(F.col("bit") / WORD_BITS).cast("long").alias("word"),
        F.expr(f"shiftleft(1L, CAST(bit % {WORD_BITS} AS INT))").alias("m"),
    )
    j = checks.join(F.broadcast(bitmap), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) == F.col("m")
    ).cast("int")
    return (
        j.groupBy(*probes.columns)
        .agg((F.sum(hit) == F.count(F.lit(1))).cast("long").alias("in_bloom"))
    )
