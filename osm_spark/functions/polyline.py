"""Google encoded-polyline codec as pure Spark column expressions.

The polyline wire format is the OSM ecosystem's compact line-geometry
interchange (the reference author maintains the canonical Go codec,
github.com/paulmach/polyline; semantics are the public Google spec):
per point, delta-encode e5-quantized lat/lon against the previous
point, zigzag the sign into bit 0, then emit little-endian 5-bit
chunks with a 0x20 continuation bit, each chunk + 63 into printable
ASCII.

Everything here is integer + string column math (no UDF):

- ENCODE: zigzag is plain arithmetic (``2d`` / ``-2d-1``), each value
  is at most :data:`MAX_CHUNKS` chunks (e5 deltas within a world span
  zigzag to < 2^26), so the chunk loop unrolls into a fixed concat of
  guarded ``char()`` terms; per-way assembly is one
  ``array_join(transform(...))`` over the ordered point array.
- DECODE needs no stateful scan: the continuation bit partitions the
  byte range — terminal chunk chars are ``[?-^]`` (63-94),
  continuation chars ``[_-~]`` (95-126) — so ONE
  ``regexp_extract_all('[_-~]*[?-^]')`` splits the string into
  per-value encodings, and each value is an unrolled 5-bit chunk sum.

A DuckDB twin (:func:`encode_value_sql`) renders the identical chunk
formula for oracles; the format is pure integers so cross-engine
equality is structural, with no float surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 7 chunks cover zigzagged values < 2^35 — comfortably past the
#: < 2^26 bound of e5 world-span deltas
MAX_CHUNKS = 7

#: one full encoded value: greedy continuation chars then one terminal
VALUE_RE = "[_-~]*[?-^]"


def zigzag(d: Column) -> Column:
    """Sign into bit 0, arithmetically (no bit ops: ~(d<<1) ≡ -2d-1)."""
    return F.when(d < 0, -2 * d - 1).otherwise(2 * d)


def unzigzag(v: Column) -> Column:
    return F.when(v % 2 == 1, -((v + 1) / 2).cast("long")).otherwise(
        (v / 2).cast("long")
    )


def encode_value(v: Column) -> Column:
    """Encoded string for one zigzagged (non-negative) value —
    the chunk loop unrolled to MAX_CHUNKS guarded char() terms."""
    parts = []
    for k in range(MAX_CHUNKS):
        rest = F.shiftright(v, 5 * k)
        chunk = rest.bitwiseAND(F.lit(31))
        more = F.shiftright(v, 5 * (k + 1)) > 0
        code = chunk.bitwiseOR(F.when(more, F.lit(32)).otherwise(F.lit(0)))
        ch = F.char((code + F.lit(63)).cast("long"))
        emit = F.lit(k == 0) | (rest > 0)
        parts.append(F.when(emit, ch).otherwise(F.lit("")))
    return F.concat(*parts)


def decode_value(s: Column) -> Column:
    """Zigzagged value from one encoded value-string (≤ MAX_CHUNKS
    chars), as an unrolled chunk sum; exact because every product is a
    small-int times an exact power of two."""
    total = F.lit(0).cast("long")
    for k in range(MAX_CHUNKS):
        ch = F.substring(s, k + 1, 1)
        term = ((F.ascii(ch) - 63).bitwiseAND(F.lit(31)).cast("long")
                * F.lit(1 << (5 * k)))
        total = total + F.when(F.length(s) > k, term).otherwise(F.lit(0))
    return total


def encode_line(deltas: Column) -> Column:
    """Polyline string from an ordered array<struct<dlat,dlon>> of e5
    integer deltas (first element = absolute coordinate)."""
    return F.array_join(
        F.transform(
            deltas,
            lambda d: F.concat(
                encode_value(zigzag(d["dlat"])),
                encode_value(zigzag(d["dlon"])),
            ),
        ),
        "",
    )


def decode_values(polyline: Column) -> Column:
    """array<bigint> of unzigzagged values (alternating dlat, dlon)."""
    return F.transform(
        F.regexp_extract_all(polyline, F.lit(VALUE_RE), 0),
        lambda s: unzigzag(decode_value(s)),
    )


def prefix_sums(vals: Column) -> Column:
    """Cumulative sums of an array<bigint> (delta → absolute), as an
    in-row fold — arrays are way-sized, never corpus-sized."""
    return F.aggregate(
        vals,
        F.array().cast("array<bigint>"),
        lambda acc, d: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0).cast("bigint")) + d
            ),
        ),
    )


# ================================================================ SQL twin

def zigzag_sql(d: str) -> str:
    return f"(CASE WHEN ({d}) < 0 THEN -2*({d}) - 1 ELSE 2*({d}) END)"


def encode_value_sql(v: str) -> str:
    """DuckDB twin of :func:`encode_value` over a zigzagged BIGINT
    expression.  ``v`` must be a simple column reference — the chunk
    formula repeats it 4×MAX_CHUNKS times."""
    parts = []
    for k in range(MAX_CHUNKS):
        rest = f"(({v}) >> {5 * k})"
        more = f"((({v}) >> {5 * (k + 1)}) > 0)"
        code = f"(({rest} & 31) | CASE WHEN {more} THEN 32 ELSE 0 END)"
        emit = "TRUE" if k == 0 else f"({rest} > 0)"
        parts.append(f"CASE WHEN {emit} THEN chr(CAST({code} + 63 AS INT)) ELSE '' END")
    return "(" + " || ".join(parts) + ")"
