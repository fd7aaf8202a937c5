"""Geohash cell index as pure Spark column expressions.

Completes the engine's cell-index family (slippy tiles + quadkey
`geo/tiles.py`, aperture-7 hex `geo/hex.py`, adaptive coverings
`geo/covering.py`) with the third standard index the OSM ecosystem
uses for point bucketing.  Same contract as the reference's tile math
(reference usage: orb/maptile semantics at bounds.go:18-34): quantize
ONCE at a fixed precision, then everything downstream is exact integer
bit math that a DuckDB oracle reproduces bit-for-bit.

Encoding (public geohash spec): a cell of precision ``p`` characters
is a 5p-bit Morton interleave of the quantized lon/lat fractions —
lon owns the FIRST (most significant) bit, so for odd ``p`` lon takes
``ceil(5p/2)`` bits / even LSB positions, for even ``p`` the parity
flips.  The base32 string uses the non-contiguous alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``; we emit it with ONE base
conversion + ONE ``translate`` + ``lpad`` (same allocation-avoidance
trick as :func:`osm_spark.geo.tiles.quadkey` — per-character
concat loops fall out of whole-stage codegen).

Scale shape: encode/decode are row-local column math (no UDF, no
shuffle); a geohash prefix is a clustering key exactly like the
quadkey value — ``repartitionByRange`` on it co-locates spatially
adjacent cells.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm_spark.geo.tiles import _col, _spread_bits

#: geohash base32 alphabet (public spec; note missing a/i/l/o)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
#: what conv()/to_base() emit for base 32, uppercase in both engines
_CONV_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUV"


def _bit_split(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a precision-``p`` geohash."""
    total = 5 * precision
    return (total + 1) // 2, total // 2


def lon_q(lon, precision: int) -> Column:
    """Quantized lon fraction: floor((lon+180)/360 * 2^lon_bits),
    clamped — identical quantize-once discipline as tiles.tile_x."""
    bits, _ = _bit_split(precision)
    n = 1 << bits
    f = (_col(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))
    return F.least(F.greatest(F.floor(f), F.lit(0)), F.lit(n - 1)).cast("long")


def lat_q(lat, precision: int) -> Column:
    _, bits = _bit_split(precision)
    n = 1 << bits
    f = (_col(lat) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))
    return F.least(F.greatest(F.floor(f), F.lit(0)), F.lit(n - 1)).cast("long")


def geohash_value(lat, lon, precision: int) -> Column:
    """The 5p-bit interleaved cell id as a long (the sort/cluster key).

    lon owns the MSB: for odd ``p`` (total bits odd) the lon bits land
    on even LSB positions, for even ``p`` on odd positions.
    """
    xs = _spread_bits(lon_q(lon, precision))
    ys = _spread_bits(lat_q(lat, precision))
    if (5 * precision) % 2 == 1:
        return xs.bitwiseOR(F.shiftleft(ys, 1))
    return ys.bitwiseOR(F.shiftleft(xs, 1))


def geohash_from_value(value, precision: int) -> Column:
    """Base32 string for an already-computed packed cell id."""
    v = _col(value)
    return F.lpad(
        F.translate(F.conv(v.cast("string"), 10, 32), _CONV_ALPHABET, ALPHABET),
        precision,
        "0",
    )


def geohash(lat, lon, precision: int) -> Column:
    """Precision-``p`` geohash string: one conv + translate + lpad."""
    return geohash_from_value(geohash_value(lat, lon, precision), precision)


def _compact_bits(v: Column) -> Column:
    """Inverse of tiles._spread_bits: gather even LSB positions of the
    low 64 bits back into a dense low-32-bit integer."""
    v = v.bitwiseAND(F.lit(0x5555555555555555))
    v = v.bitwiseOR(F.shiftright(v, 1)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftright(v, 2)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftright(v, 4)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftright(v, 8)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftright(v, 16)).bitwiseAND(F.lit(0x00000000FFFFFFFF))
    return v


def decode_lon_q(value, precision: int) -> Column:
    """Deinterleave the packed cell id back to the quantized lon —
    exact inverse of :func:`geohash_value` (asserted by the
    ``geohash_cell`` oracle, which quantizes directly)."""
    v = _col(value)
    if (5 * precision) % 2 == 1:
        return _compact_bits(v)
    return _compact_bits(F.shiftright(v, 1))


def decode_lat_q(value, precision: int) -> Column:
    v = _col(value)
    if (5 * precision) % 2 == 1:
        return _compact_bits(F.shiftright(v, 1))
    return _compact_bits(v)


# ================================================================ SQL twins
# Byte-identical DuckDB expressions (same operation order / IEEE doubles;
# to_base() is DuckDB's conv()).

def _spread_bits_sql(v: str) -> str:
    s = f"({v})"
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def lon_q_sql(lon: str, precision: int) -> str:
    bits, _ = _bit_split(precision)
    n = 1 << bits
    f = f"(({lon}) + 180.0) / 360.0 * {float(n)!r}"
    return f"CAST(least(greatest(floor({f}), 0), {n - 1}) AS BIGINT)"


def lat_q_sql(lat: str, precision: int) -> str:
    _, bits = _bit_split(precision)
    n = 1 << bits
    f = f"(({lat}) + 90.0) / 180.0 * {float(n)!r}"
    return f"CAST(least(greatest(floor({f}), 0), {n - 1}) AS BIGINT)"


def geohash_value_sql(lat: str, lon: str, precision: int) -> str:
    xs = _spread_bits_sql(lon_q_sql(lon, precision))
    ys = _spread_bits_sql(lat_q_sql(lat, precision))
    if (5 * precision) % 2 == 1:
        return f"({xs} | ({ys} << 1))"
    return f"({ys} | ({xs} << 1))"


def geohash_sql(lat: str, lon: str, precision: int) -> str:
    v = geohash_value_sql(lat, lon, precision)
    return (
        f"lpad(translate(to_base({v}, 32), "
        f"'{_CONV_ALPHABET}', '{ALPHABET}'), {precision}, '0')"
    )
