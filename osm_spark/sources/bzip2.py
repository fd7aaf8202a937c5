"""Splittable bzip2 source — parallel ``.osm.bz2`` block decode.

The reference scans planet bzip2 dumps through ONE sequential reader
(osmxml/scanner_test.go:163-230 streams a .osm.bz2 fixture through a
single bzip2.NewReader).  Planet dumps ship as bzip2, so at 100 TB the
compressed file itself must be the dataset: this module re-expresses
the read Hadoop-style (SplittableCompressionCodec / CBZip2InputStream
semantics) as byte-range splits over the RAW compressed bytes.

Why bzip2 is splittable when gzip is not: a bzip2 stream is a 4-byte
header (``BZh`` + level digit) followed by back-to-back *independent*
blocks, each introduced by the 48-bit magic ``0x314159265359`` at an
arbitrary BIT offset, and terminated by the 48-bit end-of-stream magic
``0x177245385090`` + a 32-bit combined CRC.  Blocks share no state, so
any block can be decompressed alone once re-wrapped as a synthetic
one-block stream.

Spark-first design (mirrors pbf.py / warc.py / xmlfile.py):

- The driver computes byte-range splits from the file SIZE alone — no
  driver-side I/O.
- Each task scans its raw range for block magics at all 8 bit phases
  (vectorized: one 56-bit sliding numpy window per chunk, 8 shift
  compares — no per-bit Python), owns every block whose magic STARTS
  in its range, and extends its read window to the first magic at/
  after its range end so its last block is complete.  Every block
  decompresses exactly once, with no cross-task coordination.
- A block is decompressed by bit-extracting ``[magic, next magic)``,
  re-aligning to byte 0, and wrapping as ``BZh9`` + block + EOS magic
  + the block's own CRC (the stream-combined CRC of a single block IS
  the block CRC — combined = rotl(0) ^ crc).  ``bz2.decompress`` then
  verifies the CRC for free.
- Multistream files (pbzip2 output) need nothing special: the scan
  treats every stream's blocks uniformly and EOS magics act only as
  block terminators.
- A 48-bit magic can in principle occur INSIDE compressed payload
  (probability ~2^-48 per bit; ~0.003 expected hits per 100 GB).
  Candidates are validated by decompression: on CRC/format failure the
  boundary is dropped and the block extends to the next candidate
  (Hadoop accepts the same residual risk without even validating).

For XML composition the decompressed blocks concatenate to the
document, so elements straddle block boundaries exactly like they
straddle raw-byte splits in xmlfile.py — and the same ownership rule
applies one level up: an element belongs to the task whose OWNED
decompressed bytes contain its start, and the task keeps decompressing
overrun blocks until the first element anchor at/after its owned
length.  :func:`read_osm_xml_bz2` returns the same ``(etype, xml)``
snippet frame as ``read_osm_xml``; feed it to ``parse_elements``.
"""

from __future__ import annotations

import bz2
import os

from pyspark.sql import DataFrame, SparkSession

_BLOCK_MAGIC = 0x314159265359  # BCD(pi), rolls in at any bit offset
_EOS_MAGIC = 0x177245385090    # BCD(sqrt(pi)) — end of stream
_MASK48 = (1 << 48) - 1

# Kinds in the boundary stream.
BLOCK, EOS = 0, 1


def _phase_patterns(magic: int):
    """For each of the 8 bit phases: the fully-determined inner bytes
    (memchr-searchable), their byte offset from the window start, and
    the two partial edge-byte checks ((mask, value) or None).

    At phase s the 48 magic bits span bytes 0..6 of the window; bytes
    1..5 come entirely from the magic (byte j = magic >> (40+s-8j)),
    byte 0 keeps only its low 8-s bits and byte 6 only its high s bits.
    Phase 0 is the aligned case: all 6 bytes are exact."""
    pats = []
    for s in range(8):
        if s == 0:
            pats.append((magic.to_bytes(6, "big"), 0, None, None))
            continue
        inner = bytes((magic >> (40 + s - 8 * j)) & 0xFF for j in range(1, 6))
        head = ((1 << (8 - s)) - 1, magic >> (40 + s))
        tail = (0xFF << (8 - s) & 0xFF, (magic & ((1 << s) - 1)) << (8 - s))
        pats.append((inner, 1, head, tail))
    return pats


_PATTERNS = [
    (kind, s, pat)
    for kind, magic in ((BLOCK, _BLOCK_MAGIC), (EOS, _EOS_MAGIC))
    for s, pat in enumerate(_phase_patterns(magic))
]


def scan_magics(buf: bytes, base: int = 0) -> list[tuple[int, int]]:
    """All (absolute_bit_position, kind) block/EOS magics in ``buf``,
    sorted; ``base`` is the file byte offset of ``buf[0]``.

    One C-speed ``bytes.find`` sweep per (magic, bit-phase) pair — 16
    sweeps total — over the fully-determined inner bytes, then the two
    partial edge bytes verify under mask.  A 5-byte inner pattern false
    positive costs one masked compare (~2^-40 per position), so every
    sweep runs at memchr speed."""
    hits: list[tuple[int, int]] = []
    n = len(buf)
    for kind, s, (inner, off, head, tail) in _PATTERNS:
        pos = buf.find(inner)
        while pos != -1:
            w = pos - off  # window start byte
            if w >= 0:
                if head is None:
                    hits.append(((base + w) * 8, kind))
                elif (
                    w + 6 < n
                    and buf[w] & head[0] == head[1]
                    and buf[w + 6] & tail[0] == tail[1]
                ):
                    hits.append(((base + w) * 8 + s, kind))
            pos = buf.find(inner, pos + 1)
    hits.sort()
    return hits


def _extract_bits(buf: bytes, p: int, nbits: int) -> int:
    """The ``nbits``-bit big-endian integer at bit offset ``p``."""
    a, b = p // 8, (p + nbits + 7) // 8
    v = int.from_bytes(buf[a:b], "big")
    excess = (b - a) * 8 - (p % 8) - nbits
    return (v >> excess) & ((1 << nbits) - 1)


def wrap_block(buf: bytes, p: int, q: int) -> bytes:
    """Re-wrap the block bits at ``[p, q)`` (bit offsets into ``buf``,
    ``p`` at a block magic, ``q`` at the next boundary) as a complete
    one-block bzip2 stream.

    Always headers ``BZh9``: the level digit only sizes the
    decompressor's block buffer, and 9 (900 KB) admits every legal
    block regardless of the source stream's own level.  The block CRC
    (bits 48..80 of the block) doubles as the stream-combined CRC.
    """
    nbits = q - p
    if nbits < 80:
        raise ValueError(f"bz2 block at bit {p} shorter than its header")
    blk = _extract_bits(buf, p, nbits)
    crc = (blk >> (nbits - 80)) & 0xFFFFFFFF
    body = (blk << 80) | (_EOS_MAGIC << 32) | crc
    tot = nbits + 80
    pad = -tot % 8
    return b"BZh9" + (body << pad).to_bytes((tot + pad) // 8, "big")


class _RangeReader:
    """Grows a task's raw window past its range end on demand and keeps
    the boundary scan incremental (rescans only appended bytes, with a
    6-byte lookback for magics straddling the growth edge)."""

    def __init__(self, path: str, start: int, size: int, step: int):
        self.f = open(path, "rb")
        self.f.seek(start)
        self.base = start
        self.size = size
        self.step = step
        self.buf = b""
        self.bnds: list[tuple[int, int]] = []
        self._scanned = 0  # window-start bytes scanned so far

    def ensure(self, upto: int) -> None:
        """Grow the window to cover file byte ``upto`` (exclusive)."""
        need = min(upto, self.size) - self.base - len(self.buf)
        if need > 0:
            data = self.f.read(max(need, self.step))
            if not data:
                # file shorter than the claimed size (truncated or
                # replaced mid-job): clamp so at_eof() turns true
                # instead of busy-spinning on empty reads forever
                self.size = self.base + len(self.buf)
                return
            self.buf += data
            lo = max(self._scanned - 6, 0)
            self.bnds.extend(
                b for b in scan_magics(self.buf[lo:], self.base + lo)
                if b[0] >= (self.base + self._scanned) * 8
            )
            self._scanned = max(len(self.buf) - 6, 0)

    def at_eof(self) -> bool:
        return self.base + len(self.buf) >= self.size

    def close(self) -> None:
        self.f.close()


def _iter_task_blocks(path: str, start: int, end: int, size: int,
                      step: int = 4 << 20):
    """Yield decompressed bytes of every block whose magic starts in
    file bytes ``[start, end)``, then (flagged) overrun blocks beyond,
    so callers can finish a trailing element.  Yields
    ``(owned: bool, data: bytes)``; stops at end of file — the caller
    breaks once it has enough overrun."""
    r = _RangeReader(path, start, size, step)
    try:
        r.ensure(end + 7)
        i = 0
        while True:
            # next block-magic boundary (EOS carries no data)
            while True:
                while i >= len(r.bnds) and not r.at_eof():
                    r.ensure(r.base + len(r.buf) + r.step)
                if i >= len(r.bnds):
                    return
                if r.bnds[i][1] == BLOCK:
                    break
                i += 1
            # previous-task exclusion is structural: the reader opens at
            # `start`, so no boundary before it can ever be discovered
            p, owned = r.bnds[i][0], r.bnds[i][0] // 8 < end
            # validate against successive boundaries (false-positive
            # magics inside payload fail decompression and are dropped)
            j, data = i + 1, None
            for _ in range(8):
                while j >= len(r.bnds) and not r.at_eof():
                    r.ensure(r.base + len(r.buf) + r.step)
                if j >= len(r.bnds):
                    break  # no terminator before EOF: truncated tail
                q = r.bnds[j][0]
                r.ensure(q // 8 + 7)
                try:
                    data = bz2.decompress(wrap_block(
                        r.buf, p - r.base * 8, q - r.base * 8))
                    break
                except (OSError, EOFError, ValueError):
                    j += 1  # boundary was a payload coincidence
            if data is None:
                i += 1  # p itself was a coincidence — no block starts here
                continue
            yield owned, data
            i = j
    finally:
        r.close()


def read_bz2_blocks(spark: SparkSession, path: str,
                    split_bytes: int = 32 << 20) -> DataFrame:
    """Parallel block-level decode of any bzip2 file -> DataFrame
    ``(split long, seq int, data binary)``: one row per block, ordered
    by (split, seq) = file order.  The parallelism unit is a raw-byte
    range; each task owns the blocks starting in its range."""
    size = os.path.getsize(path)
    splits = [
        (path, off, min(off + split_bytes, size), size)
        for off in range(0, max(size, 1), split_bytes)
    ]
    df = spark.createDataFrame(
        splits, "path string, start long, end long, size long"
    ).repartition(len(splits))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, s, e, z in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["size"]
            ):
                seq = 0
                for owned, data in _iter_task_blocks(p, int(s), int(e), int(z)):
                    if not owned:
                        break
                    rows.append((int(s), seq, data))
                    seq += 1
            yield pd.DataFrame(rows, columns=["split", "seq", "data"])

    return df.mapInPandas(gen, schema="split long, seq int, data binary")


def read_osm_xml_bz2(spark: SparkSession, path: str,
                     split_bytes: int = 32 << 20) -> DataFrame:
    """Element-wise PARALLEL scan of a ``.osm.bz2`` file -> the same
    ``(etype, xml)`` snippet frame as ``read_osm_xml`` (feed it to
    ``parse_elements``).  Two-level Hadoop split semantics: a task owns
    the bz2 blocks starting in its raw range; within the concatenated
    decompressed bytes it owns the elements STARTING in its owned
    blocks, and it keeps decompressing overrun blocks until the first
    element anchor at/after its owned length (by top-level sequencing
    every owned element closes before that anchor).  The same planet/
    diff-shape contract as read_osm_xml applies (element bodies carry
    no scannable child tags)."""
    from osm_spark.sources.xmlfile import _ANCHOR_RE, iter_elements

    size = os.path.getsize(path)
    splits = [
        (path, off, min(off + split_bytes, size), size)
        for off in range(0, max(size, 1), split_bytes)
    ]
    df = spark.createDataFrame(
        splits, "path string, start long, end long, size long"
    ).repartition(len(splits))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_t, out_x = [], []
            for p, s, e, z in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["size"]
            ):
                # the anchor scan per overrun block looks only at that
                # block plus a 15-byte carry (anchors are <=11 bytes, so
                # one straddling the previous part's edge is caught);
                # `pos` tracks the carry's absolute stream offset so
                # anchors inside the last OWNED bytes don't count
                owned_len, parts, tail, pos = 0, [], b"", 0
                for owned, data in _iter_task_blocks(p, int(s), int(e), int(z)):
                    if owned:
                        parts.append(data)
                        owned_len += len(data)
                        pos += len(data)
                        tail = data[-15:]
                        continue
                    if owned_len == 0:
                        break  # nothing owned: skip foreign decompression
                    parts.append(data)
                    base = pos - len(tail)
                    if any(
                        base + m.start() >= owned_len
                        for m in _ANCHOR_RE.finditer(tail + data)
                    ):
                        break  # every owned element closes before it
                    pos += len(data)
                    tail = (tail + data)[-15:]
                if owned_len == 0:
                    continue
                buf = b"".join(parts)
                for tag, st, en in iter_elements(buf, owned_len):
                    out_t.append(tag)
                    out_x.append(buf[st:en].decode("utf-8", "replace"))
            yield pd.DataFrame({"etype": out_t, "xml": out_x})

    return df.mapInPandas(gen, schema="etype string, xml string")
