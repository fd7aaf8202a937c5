"""WARC (Web ARChive, ISO 28500) file source and writer.

The north-rule input is a table of Common-Crawl-style web pages
``(url, warc_ts, html:binary, text, lang)`` — and Common Crawl's actual
on-disk container is WARC with **one gzip member per record** (the
convention that makes a .warc.gz splittable without coordination: any
task can land anywhere in the file, scan forward to the next gzip
member that inflates to a ``WARC/`` header, and own every member
starting in its byte range).  This module is that reader/writer,
expressed exactly like the repo's other file sources (the PBF block
scan in sources/pbf.py and the byte-range XML scan in
sources/xmlfile.py): the driver computes byte-range splits from file
size alone, each task reads only its range plus a bounded overrun, and
every record decodes exactly once.

The reference engine has no web-container source — its analogue is the
osmpbf Scanner's blob framing (reference osmpbf/scanner.go), which this
mirrors structurally: length-delimited records, per-record compression,
split-by-start-offset ownership.

Record grammar (WARC 1.0):

    WARC/1.0\r\n
    <Name>: <value>\r\n ...          (case-insensitive names)
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n                          (record terminator)

Split-exactness contract:

- ``.warc.gz`` with one member per record (what :func:`write_warc`
  emits and Common Crawl ships): exact under offset splits.  A member
  start is verified by actually inflating and checking the plaintext
  begins with ``WARC/`` — a raw ``\\x1f\\x8b\\x08`` byte triple inside
  compressed data cannot survive both checks.
- plain ``.warc``: NOT offset-splittable (a payload may legally contain
  the ``WARC/1.0`` anchor bytes), so it scans as one split — same
  stance as xmlfile.py takes for .osm.bz2.
"""

from __future__ import annotations

import gzip
import io
import os
import time
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GZ_MAGIC = b"\x1f\x8b\x08"
_CRLF = b"\r\n"

WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)
# with_offsets=True adds the CDX columns (member byte position/size in
# the container — what Common Crawl's cdx index stores per capture).
WARC_OFFSET_SCHEMA = WARC_SCHEMA + ", member_offset long, member_size long"


# ---------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------

def format_warc_date(epoch: int) -> str:
    """ISO 8601 UTC second precision — the WARC-Date grammar."""
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(epoch))


def build_record(
    payload: bytes,
    warc_type: str = "response",
    target_uri: str | None = None,
    warc_date_epoch: int = 0,
    record_id: str | None = None,
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One spec-conformant WARC record (header block + payload +
    terminator).  ``record_id`` defaults to a urn:uuid derived from
    nothing random — callers pass one for determinism."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", format_warc_date(warc_date_epoch)),
        ("WARC-Record-ID", record_id or "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    ) + _CRLF
    return head + payload + _CRLF + _CRLF


def write_warc(path: str, records: list[bytes], gzip_records: bool | None = None) -> None:
    """Write records to ``path``.  ``.gz`` paths (or gzip_records=True)
    get ONE GZIP MEMBER PER RECORD — the Common Crawl layout that makes
    the file offset-splittable.  mtime is pinned so the bytes are a
    pure function of the records."""
    if gzip_records is None:
        gzip_records = path.endswith(".gz")
    buf = io.BytesIO()
    for rec in records:
        if gzip_records:
            member = io.BytesIO()
            with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as g:
                g.write(rec)
            buf.write(member.getvalue())
        else:
            buf.write(rec)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)  # atomic vs concurrent sessions


# ---------------------------------------------------------------------
# Record parse (bytes -> dict), shared by every read path
# ---------------------------------------------------------------------

def parse_record(rec: bytes) -> dict:
    """Parse one record's bytes (header block + payload).  Header names
    are case-insensitive per spec; Content-Length is authoritative for
    the payload span."""
    if not rec.startswith(b"WARC/"):
        raise ValueError("not a WARC record (missing WARC/ version line)")
    head_end = rec.index(b"\r\n\r\n")
    lines = rec[:head_end].split(_CRLF)
    h: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        h[k.strip().lower().decode()] = v.strip().decode()
    n = int(h.get("content-length", "0"))
    body_at = head_end + 4
    return {
        "warc_type": h.get("warc-type", ""),
        "record_id": h.get("warc-record-id", ""),
        "target_uri": h.get("warc-target-uri", ""),
        "warc_date": h.get("warc-date", ""),
        "content_type": h.get("content-type", ""),
        "content_length": n,
        "payload": rec[body_at:body_at + n],
    }


def _iter_plain(buf: bytes):
    """Walk records in an uncompressed WARC buffer via Content-Length
    (never by searching payload bytes)."""
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad record boundary at byte {pos}")
        head_end = buf.index(b"\r\n\r\n", pos)
        n = 0
        for line in buf[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                n = int(v)
        end = head_end + 4 + n + 4
        rec = parse_record(buf[pos:end])
        rec["member_offset"], rec["member_size"] = pos, end - pos
        yield rec
        pos = end


def _inflate_member(f, offset: int, read_step: int) -> tuple[bytes, int] | None:
    """Inflate ONE gzip member starting at ``offset``; return
    (plaintext, compressed_size) or None if offset is not a member
    start.  Reads the file lazily in ``read_step`` chunks."""
    f.seek(offset)
    d = zlib.decompressobj(wbits=31)
    out = bytearray()
    consumed = 0
    while True:
        chunk = f.read(read_step)
        if not chunk:
            return None  # truncated member
        try:
            out += d.decompress(chunk)
        except zlib.error:
            return None  # not a real member start
        if d.eof:
            consumed += len(chunk) - len(d.unused_data)
            return bytes(out), consumed
        consumed += len(chunk)


_FEED = 64 << 10  # bytes fed to the inflater per call while walking


def _walk_members_buffered(f, start: int, end: int, read_step: int):
    """Yield ``(abs_offset, member_size, plaintext)`` for every gzip
    member STARTING in ``[start, end)``, reading the split's byte range
    exactly once (plus a bounded overrun to finish the last owned
    member) — linear I/O regardless of member count.

    The first member start is found by magic-candidate scan + inflate
    verification; subsequent starts come from the inflater's consumed
    byte counts, so verification never repeats."""
    f.seek(start)
    # +2 so a member whose start is just before `end` still exposes its
    # full 3-byte magic for detection (ownership stays start-offset<end)
    data = bytearray(f.read(end - start + 2))
    # adaptive inflater feed: members are a few hundred bytes compressed
    # in a Common-Crawl-layout file, and every byte fed past the member
    # end comes back as a fresh `unused_data` allocation — feeding a
    # fixed 64 KB per ~400-byte member cost ~128 KB of memcpy/alloc PER
    # PAGE (the allocator wall that capped full-decode scaling at ~0.5
    # on one socket). Track the last member's compressed size and feed
    # ~2x that, growing toward _FEED only when a member runs long.
    est = [4096]

    def _extend() -> bool:
        more = f.read(read_step)
        if not more:
            return False
        data.extend(more)
        return True

    def _inflate_at(pos: int):
        """(plaintext, consumed) for a member at pos, or None."""
        d = zlib.decompressobj(wbits=31)
        i = pos
        first = None
        parts = None
        step = est[0]
        while True:
            take = min(step, len(data) - i)
            if take <= 0:
                if not _extend():
                    return None  # truncated
                continue
            try:
                # inline unnamed memoryview: zero-copy feed, and no
                # lingering view to block data.extend() resizes
                piece = d.decompress(memoryview(data)[i:i + take])
            except zlib.error:
                return None
            i += take
            if first is None:
                first = piece
            else:
                if parts is None:
                    parts = [first]
                parts.append(piece)
            if d.eof:
                consumed = i - pos - len(d.unused_data)
                est[0] = min(_FEED, max(512, consumed + (consumed >> 1)))
                return (
                    first if parts is None else b"".join(parts)
                ), consumed
            step = _FEED  # member longer than the estimate: stride up

    # locate the first VERIFIED member start at/after `start`
    pos, first = 0, None
    while start + pos < end:
        hit = data.find(_GZ_MAGIC, pos)
        if hit == -1 or start + hit >= end:
            return
        got = _inflate_at(hit)
        if got is not None and got[0].startswith(b"WARC/"):
            pos, first = hit, got
            break
        pos = hit + 1
    if first is None:
        return
    # the verification already inflated the first member — emit it
    # directly instead of inflating it a second time
    plain, consumed = first
    yield start + pos, consumed, plain
    pos += consumed
    # walk member-to-member
    while start + pos < end:
        got = _inflate_at(pos)
        if got is None:
            return
        plain, consumed = got
        yield start + pos, consumed, plain
        pos += consumed


# ---------------------------------------------------------------------
# Parallel scan
# ---------------------------------------------------------------------

_FIELD_TYPES = {
    "warc_type": "string", "record_id": "string", "target_uri": "string",
    "warc_date": "string", "content_type": "string",
    "content_length": "long", "payload": "binary",
    "member_offset": "long", "member_size": "long",
}
_HEADER_KEY = {
    "warc_type": "warc-type", "record_id": "warc-record-id",
    "target_uri": "warc-target-uri", "warc_date": "warc-date",
    "content_type": "content-type",
}


def read_warc(
    spark: SparkSession,
    path: str,
    split_bytes: int = 64 << 20,
    read_step: int = 1 << 20,
    with_offsets: bool = False,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Block-parallel WARC scan -> DataFrame with :data:`WARC_SCHEMA`
    (or :data:`WARC_OFFSET_SCHEMA` when ``with_offsets``, adding each
    record's gzip-member byte position/size — the CDX index columns).
    ``columns`` prunes the output to a subset — projection pushed into
    the decode itself (a header-only scan skips materializing payload
    bytes into Arrow entirely), mirroring the PBF pruned scan.

    ``.warc.gz`` (member-per-record) splits into ``split_bytes`` byte
    ranges; a task owns every gzip member whose start offset falls in
    its range (verified by inflate + ``WARC/`` prefix), walking
    member-to-member via the inflater's consumed-byte count and reading
    past its range end only to finish the last owned member.  Plain
    ``.warc`` scans as one split (see module contract; offsets there
    are the record's byte span in the uncompressed file).
    """
    size = os.path.getsize(path)
    is_gz = path.endswith(".gz")
    if is_gz:
        splits = [
            (path, off, min(off + split_bytes, size))
            for off in range(0, max(size, 1), split_bytes)
        ]
    else:
        splits = [(path, 0, size)]
    df = spark.createDataFrame(splits, "path string, start long, end long")
    df = df.repartition(len(splits))

    cols = [
        "warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "content_length", "payload",
    ]
    if with_offsets:
        cols += ["member_offset", "member_size"]
    if columns is not None:
        unknown = set(columns) - set(cols)
        if unknown:
            raise ValueError(f"read_warc: unknown columns {sorted(unknown)}")
        cols = [c for c in cols if c in columns]
        if not cols:
            raise ValueError("read_warc: columns must name at least one field")
    schema = ", ".join(f"{c} {_FIELD_TYPES[c]}" for c in cols)
    gen = _make_arrow_gen(cols, is_gz, read_step)
    return df.mapInArrow(gen, schema=schema)


class _BytesAcc:
    """Arrow string/binary column built from one growing byte buffer +
    int32 offsets — zero per-value Python objects (the PBF Arrow node
    scan's trick, pbf.py read_pbf_file_nodes_arrow)."""

    __slots__ = ("buf", "offs", "_pa_type")

    def __init__(self, pa_type):
        self.buf = bytearray()
        self.offs = [0]
        self._pa_type = pa_type

    def add(self, b: bytes) -> None:
        self.buf += b
        self.offs.append(len(self.buf))

    def array(self):
        import numpy as np
        import pyarrow as pa

        n = len(self.offs) - 1
        return pa.Array.from_buffers(
            self._pa_type, n,
            [None,
             pa.py_buffer(np.asarray(self.offs, dtype=np.int32).tobytes()),
             pa.py_buffer(bytes(self.buf))],
        )


def _make_arrow_gen(cols, is_gz: bool, read_step: int):
    """mapInArrow generator: walks members and accumulates straight
    into Arrow buffers — no pandas, no per-record Python objects for
    strings/payloads.  One RecordBatch per input split keeps the int32
    offset buffers far under their 2 GB bound (splits are <= 64 MB)."""
    header_cols = [c for c in cols if c in _HEADER_KEY]
    hdr_keys = [(c, b"\n" + _HEADER_KEY[c].encode() + b":")
                for c in header_cols]
    want_len = "content_length" in cols
    want_payload = "payload" in cols
    want_off = "member_offset" in cols
    want_size = "member_size" in cols

    # int32 Arrow offsets bound each _BytesAcc buffer at 2^31-1 bytes;
    # a 64 MB COMPRESSED split can inflate past that on highly
    # compressible members, so flush a batch whenever any buffer nears
    # the bound (split size bounds the compressed range, not the
    # decompressed payload volume)
    FLUSH_BYTES = 1 << 30

    def gen(batches):
        import pyarrow as pa

        def new_acc():
            acc = {}
            for c in cols:
                t = _FIELD_TYPES[c]
                acc[c] = (
                    _BytesAcc(pa.binary()) if t == "binary"
                    else _BytesAcc(pa.string()) if t == "string"
                    else []
                )
            return acc

        def overflowing(acc) -> bool:
            return any(
                isinstance(a, _BytesAcc) and len(a.buf) > FLUSH_BYTES
                for a in acc.values()
            )

        def emit(acc, n):
            return pa.RecordBatch.from_arrays(
                [acc[c].array() if isinstance(acc[c], _BytesAcc)
                 else pa.array(acc[c], pa.int64()) for c in cols],
                names=list(cols),
            )

        for batch in batches:
            d = {name: batch.column(i).to_pylist()
                 for i, name in enumerate(batch.schema.names)}
            for p, start, end in zip(d["path"], d["start"], d["end"]):
                acc = new_acc()
                n = 0
                with open(p, "rb") as f:
                    if not is_gz:
                        for rec in _iter_plain(f.read()):
                            for c in cols:
                                v = rec[c]
                                if isinstance(acc[c], _BytesAcc):
                                    acc[c].add(
                                        v if isinstance(v, bytes)
                                        else v.encode()
                                    )
                                else:
                                    acc[c].append(v)
                            n += 1
                            if overflowing(acc):
                                yield emit(acc, n)
                                acc = new_acc()
                                n = 0
                    else:
                        for off, consumed, plain in _walk_members_buffered(
                            f, int(start), int(end), read_step
                        ):
                            head_end = plain.index(b"\r\n\r\n")
                            head = plain[:head_end]
                            low = head.lower()

                            def val(key: bytes) -> bytes:
                                i = low.find(key)
                                if i == -1:
                                    return b""
                                j = i + len(key)
                                k = low.find(b"\r", j)
                                if k == -1:
                                    k = len(head)
                                return head[j:k].strip()

                            for c, key in hdr_keys:
                                acc[c].add(val(key))
                            ln = int(val(b"\ncontent-length:") or b"0")
                            if want_len:
                                acc["content_length"].append(ln)
                            if want_payload:
                                acc["payload"].add(
                                    plain[head_end + 4:head_end + 4 + ln]
                                )
                            if want_off:
                                acc["member_offset"].append(off)
                            if want_size:
                                acc["member_size"].append(consumed)
                            n += 1
                            if overflowing(acc):
                                yield emit(acc, n)
                                acc = new_acc()
                                n = 0
                if n:
                    yield emit(acc, n)

    return gen


def cdx_index(records: DataFrame) -> DataFrame:
    """CDX-style capture index from a ``with_offsets`` scan: one row
    per record — (url, warc_date, offset, length, digest).  This is the
    Common Crawl access pattern: the index is built once by a full
    scan, then consumers pread single records by offset without ever
    scanning the container again (:func:`read_warc_at`)."""
    return records.select(
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        F.col("member_offset").alias("offset"),
        F.col("member_size").alias("length"),
        F.md5(F.col("payload")).alias("digest"),
    )


def read_warc_at(spark: SparkSession, path: str, index: DataFrame) -> DataFrame:
    """Random access: decode ONLY the records named by the index's
    (offset, length) rows — each task preads exactly its members'
    byte ranges (one seek+read per record, zero container scanning).
    Output schema = :data:`WARC_OFFSET_SCHEMA`."""
    is_gz = path.endswith(".gz")
    sel = index.select(
        F.col("offset").cast("long").alias("offset"),
        F.col("length").cast("long").alias("length"),
    )

    def gen(batches):
        import pandas as pd

        with open(path, "rb") as f:
            for pdf in batches:
                rows: list[dict] = []
                for off, ln in zip(pdf["offset"], pdf["length"]):
                    f.seek(int(off))
                    buf = f.read(int(ln))
                    plain = gzip.decompress(buf) if is_gz else buf
                    rec = parse_record(plain)
                    rec["member_offset"] = int(off)
                    rec["member_size"] = int(ln)
                    rows.append(rec)
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "warc_type", "record_id", "target_uri",
                            "warc_date", "content_type", "content_length",
                            "payload", "member_offset", "member_size",
                        ],
                    )

    return sel.mapInPandas(gen, schema=WARC_OFFSET_SCHEMA)


def pages_from_warc(records: DataFrame) -> DataFrame:
    """response records -> the north-rule page shape
    ``(url, warc_ts: timestamp, html: binary)``."""
    return records.where(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"),
        # pattern X parses the Z designator as a real UTC offset, so the
        # instant is correct whatever the session time zone is
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX"
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
    )
