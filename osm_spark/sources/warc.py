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


# ---------------------------------------------------------------------
# Parallel scan
# ---------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    split_bytes: int = 64 << 20,
    read_step: int = 1 << 20,
    with_offsets: bool = False,
) -> DataFrame:
    """Block-parallel WARC scan -> DataFrame with :data:`WARC_SCHEMA`
    (or :data:`WARC_OFFSET_SCHEMA` when ``with_offsets``, adding each
    record's gzip-member byte position/size — the CDX index columns).

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

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for p, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                with open(p, "rb") as f:
                    if not is_gz:
                        rows.extend(_iter_plain(f.read()))
                        continue
                    # find the first VERIFIED member start at/after
                    # `start` (candidate = magic bytes, proof = inflates
                    # to a WARC/ header)
                    off = int(start)
                    while off < end:
                        f.seek(off)
                        window = f.read(read_step)
                        if not window:
                            off = end
                            break
                        hit = window.find(_GZ_MAGIC)
                        while hit != -1 and off + hit < end:
                            got = _inflate_member(f, off + hit, read_step)
                            if got is not None and got[0].startswith(b"WARC/"):
                                off = off + hit
                                hit = -2  # found
                                break
                            hit = window.find(_GZ_MAGIC, hit + 1)
                        if hit == -2:
                            break
                        off += max(len(window) - 2, 1)  # magic may straddle
                    # walk members owned by this range
                    while off < end:
                        got = _inflate_member(f, off, read_step)
                        if got is None:
                            break
                        plain, consumed = got
                        rec = parse_record(plain)
                        rec["member_offset"], rec["member_size"] = off, consumed
                        rows.append(rec)
                        off += consumed
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    cols = [
        "warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "content_length", "payload",
    ]
    if with_offsets:
        cols += ["member_offset", "member_size"]
    return df.mapInPandas(
        gen, schema=WARC_OFFSET_SCHEMA if with_offsets else WARC_SCHEMA
    )


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
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
    )
