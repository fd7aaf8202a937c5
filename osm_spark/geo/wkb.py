"""WKB (Well-Known Binary) geometry codec — pure Python + numpy.

The north star mandates "ray-casting over WKB polygons in pandas UDFs":
polygons travel between stages as ISO WKB binary columns, decoded
batch-wise inside Arrow UDFs. This module is the dependency-free codec
(the sandbox has no shapely/GEOS and DuckDB has no spatial extension):

- little-endian ISO WKB, geometry types Point(1), LineString(2),
  Polygon(3), MultiPolygon(6);
- decode accepts BOTH byte orders (byte 0: 1=LE, 0=BE);
- coordinate payloads move through numpy ``<f8`` views, so encoding a
  10^6-vertex batch is a handful of array copies, not a Python loop.

Layout refresher (one polygon)::

    byte 0       byte order (1 = little-endian)
    bytes 1-4    geometry type (uint32)
    bytes 5-8    number of rings (uint32)
    per ring:    uint32 vertex count, then count x (float64 x, float64 y)

so a single-ring polygon with n vertices is 9 + 4 + 16n bytes.

Reference parity: the reference keeps geometries as orb structs and
(de)serializes via orb/encoding/wkb when talking to external systems;
here WKB is the engine's wire format for polygon columns (SURVEY §2.8
geometry encoding analog).
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOLYGON = 6


def _ring_bytes(xs, ys) -> bytes:
    xs = np.asarray(xs, dtype="<f8")
    ys = np.asarray(ys, dtype="<f8")
    if len(xs) != len(ys):
        raise ValueError("ring xs/ys length mismatch")
    coords = np.empty((len(xs), 2), dtype="<f8")
    coords[:, 0] = xs
    coords[:, 1] = ys
    return struct.pack("<I", len(xs)) + coords.tobytes()


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def encode_linestring(xs, ys) -> bytes:
    return struct.pack("<BI", 1, LINESTRING) + _ring_bytes(xs, ys)


def encode_polygon(rings: list[tuple]) -> bytes:
    """``rings``: [(xs, ys), ...] — first ring outer, rest holes."""
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for xs, ys in rings:
        out.append(_ring_bytes(xs, ys))
    return b"".join(out)


def encode_multipolygon(polygons: list[list[tuple]]) -> bytes:
    """``polygons``: [[(xs, ys), ...], ...] (nested full WKB polygons,
    per spec)."""
    out = [struct.pack("<BII", 1, MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, le: bool) -> int:
        v = struct.unpack_from("<I" if le else ">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, n: int, le: bool) -> tuple[np.ndarray, np.ndarray]:
        arr = np.frombuffer(
            self.buf, dtype="<f8" if le else ">f8", count=2 * n, offset=self.pos
        )
        self.pos += 16 * n
        return arr[0::2].astype(np.float64), arr[1::2].astype(np.float64)


def _decode_geom(r: _Reader):
    le = r.u8() == 1
    gtype = r.u32(le)
    if gtype == POINT:
        xs, ys = r.coords(1, le)
        return POINT, [(xs, ys)]
    if gtype == LINESTRING:
        n = r.u32(le)
        return LINESTRING, [r.coords(n, le)]
    if gtype == POLYGON:
        nr = r.u32(le)
        rings = []
        for _ in range(nr):
            n = r.u32(le)
            rings.append(r.coords(n, le))
        return POLYGON, rings
    if gtype == MULTIPOLYGON:
        np_ = r.u32(le)
        rings = []
        for _ in range(np_):
            sub_type, sub_rings = _decode_geom(r)
            if sub_type != POLYGON:
                raise ValueError(f"multipolygon member has type {sub_type}")
            rings.extend(sub_rings)
        return MULTIPOLYGON, rings
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode(buf: bytes) -> tuple[int, list[tuple[np.ndarray, np.ndarray]]]:
    """-> (geom_type, [(xs, ys), ...]). MultiPolygon rings are flattened
    in order (outer_1, holes_1, outer_2, ...)."""
    return _decode_geom(_Reader(bytes(buf)))


def geom_type(buf: bytes) -> int:
    """Header-only peek (no coordinate parse)."""
    buf = bytes(buf)
    le = buf[0] == 1
    return struct.unpack_from("<I" if le else ">I", buf, 1)[0]
