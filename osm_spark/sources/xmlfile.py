"""Streaming OSM XML file source (reference osmxml/scanner.go:34-125).

The reference steps ONE xml.Decoder element-wise through a stream and
emits bounds/node/way/relation/changeset/note/user objects (the Scan
loop's tag switch, scanner.go:63-121, case-insensitive names). That is
a single-reader shape; at 100 TB the file itself must be the dataset.

Spark-first design, mirroring the PBF block scan (pbf.py:644-704):

- The driver computes BYTE-RANGE splits from the file size alone — no
  data is read driver-side.
- Each task reads only its range plus a bounded overrun: an element
  belongs to the split containing its START byte (Hadoop text-split
  semantics), and the task extends its window to the first top-level
  element start at/after its range end, which by top-level sequencing
  is past the end of every element it owns. Every element therefore
  parses exactly once, with no cross-task coordination.
- Snippet extraction is byte scanning only (regex, C-speed); the
  actual XML parse happens JVM-side via from_xml over the snippet
  column (functions/xml_codec.py schemas) — no Python XML parsing.
- ``.osm.bz2`` IS splittable (sources/bzip2.py, Hadoop
  SplittableCompressionCodec semantics): tasks own the bit-aligned
  bzip2 blocks starting in their raw range and the elements starting
  in their owned decompressed bytes — planet dumps ship as bzip2, so
  this is the path that matters at 100 TB. ``.osm.gz`` stays a single
  stream split (gzip carries inter-block state; same as Hadoop).
  scanner_test.go:163-230 is the reference's sequential bz2 path.

Well-formedness contract (documented, not checked): '<' never appears
raw outside markup (XML requires ``&lt;``), so element starts and
closers are exact byte patterns; '>' inside attribute values IS
handled (quote-aware start-tag regex — Spark's to_xml leaves it raw);
comments/CDATA are masked within a window, but one straddling a split
boundary is undefined behavior, as in every offset-split XML reader.
"""

from __future__ import annotations

import bz2
import gzip
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tags the reference scanner dispatches on (scanner.go:85-113).
SCAN_TAGS = ("bounds", "node", "way", "relation", "changeset", "note", "user")

# Start tag, quote-aware so raw '>' inside attribute values cannot end
# it early; group 2 distinguishes self-closing.
_START_RE = re.compile(
    rb"<(bounds|node|way|relation|changeset|note|user)\b"
    rb"(?:[^>\"']|\"[^\"]*\"|'[^']*')*?(/>|>)",
    re.IGNORECASE,
)
# Anchor for split-extension: any scannable element start.
_ANCHOR_RE = re.compile(
    rb"<(?:bounds|node|way|relation|changeset|note|user)[\s/>]",
    re.IGNORECASE,
)
_MASK_RE = re.compile(rb"<!--[\s\S]*?-->|<!\[CDATA\[[\s\S]*?\]\]>")

_CLOSERS = {
    t: re.compile(rb"</" + t.encode() + rb"\s*>", re.IGNORECASE)
    for t in SCAN_TAGS
}


def _mask_nonmarkup(buf: bytes) -> bytes:
    """Overwrite comments/CDATA with spaces, preserving offsets."""
    if b"<!" not in buf:
        return buf
    out = bytearray(buf)
    for m in _MASK_RE.finditer(buf):
        out[m.start():m.end()] = b" " * (m.end() - m.start())
    return bytes(out)


def iter_elements(buf: bytes, limit: int | None = None):
    """Yield ``(tag, start, end)`` byte spans of every top-level
    scannable element whose start offset is < limit (None = all).
    Elements may be self-closing or paired; children never carry a raw
    '<', so the closer search is exact."""
    buf = _mask_nonmarkup(buf)
    pos = 0
    while True:
        m = _START_RE.search(buf, pos)
        if m is None or (limit is not None and m.start() >= limit):
            return
        tag = m.group(1).lower().decode()
        if m.group(2) == b"/>":
            end = m.end()
        else:
            c = _CLOSERS[tag].search(buf, m.end())
            if c is None:
                return  # truncated trailing element: not ours
            end = c.end()
        yield tag, m.start(), end
        pos = end


def scan_xml_bytes(spark: SparkSession, data: bytes) -> DataFrame:
    """In-memory scan (the reference's strings.NewReader tests):
    one-partition snippet frame (etype, xml)."""
    rows = [
        (t, data[s:e].decode("utf-8", "replace"))
        for t, s, e in iter_elements(data)
    ]
    return spark.createDataFrame(rows, "etype string, xml string")


def _compression(path: str) -> str | None:
    if path.endswith(".bz2"):
        return "bz2"
    if path.endswith(".gz"):
        return "gz"
    return None


def read_osm_xml(
    spark: SparkSession,
    path: str,
    split_bytes: int = 32 << 20,
    read_step: int = 4 << 20,
    bz2_split: bool = True,
) -> DataFrame:
    """Element-wise parallel scan of a ``.osm`` file (optionally
    .gz/.bz2) -> DataFrame (etype string, xml string).

    Plain files split into ``split_bytes`` ranges; each task owns the
    elements STARTING in its range and reads just past its end to
    finish the last one. ``.bz2`` files split the same way over the
    compressed bytes via bit-aligned block ownership
    (:func:`osm_spark.sources.bzip2.read_osm_xml_bz2` — planet dumps
    are bzip2, so the compressed file stays the dataset). ``.gz``
    scans as one stream split. Feed the result to
    :func:`parse_elements` for typed columns.

    Multi-split scanning is exact for files whose element bodies carry
    no scannable child tags — i.e. the planet/diff shape (node/way/
    relation/bounds, whose children are only tag/nd/member). A notes
    feed nests ``<user>`` inside ``<note>``, so a split starting
    mid-note could misread the tail; scan such feeds with
    ``split_bytes`` >= file size, or ``bz2_split=False`` to force the
    pre-round-5 single-stream bz2 behavior without knowing the size.
    """
    comp = _compression(path)
    size = os.path.getsize(path)
    if comp == "bz2" and bz2_split and size > split_bytes:
        from osm_spark.sources.bzip2 import read_osm_xml_bz2

        return read_osm_xml_bz2(spark, path, split_bytes)
    if comp:
        splits = [(path, 0, size, comp)]
    else:
        splits = [
            (path, off, min(off + split_bytes, size), "")
            for off in range(0, max(size, 1), split_bytes)
        ]
    df = spark.createDataFrame(
        splits, "path string, start long, end long, comp string"
    )
    # one split per task — ranges are the parallelism unit
    df = df.repartition(len(splits))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_t, out_x = [], []
            for path, start, end, comp in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["comp"]
            ):
                if comp:
                    opener = bz2.open if comp == "bz2" else gzip.open
                    with opener(path, "rb") as f:
                        buf = f.read()
                    limit = None
                else:
                    with open(path, "rb") as f:
                        f.seek(start)
                        buf = f.read(end - start)
                        # extend to the first element start at/after
                        # `end`: everything we own closes before it
                        while True:
                            if _ANCHOR_RE.search(buf, end - start):
                                break
                            ext = f.read(read_step)
                            if not ext:
                                break
                            buf += ext
                    limit = end - start
                for tag, s, e in iter_elements(buf, limit):
                    out_t.append(tag)
                    out_x.append(buf[s:e].decode("utf-8", "replace"))
            yield pd.DataFrame({"etype": out_t, "xml": out_x})

    return df.mapInPandas(gen, schema="etype string, xml string")


def parse_elements(snippets: DataFrame, etype: str) -> DataFrame:
    """Typed parse of one element kind from a snippet frame — the
    Scan-loop DecodeElement dispatch (scanner.go:85-113), JVM-side."""
    from osm_spark.functions.xml_codec import (
        _NODE_SCHEMA, _REL_SCHEMA, _WAY_SCHEMA,
    )

    df = snippets.where(F.col("etype") == etype)
    if etype == "node":
        e = df.select(F.from_xml("xml", _NODE_SCHEMA, {"rowTag": "node"}).alias("e"))
        return e.select(
            F.col("e._id").alias("id"),
            F.col("e._lat").alias("lat"),
            F.col("e._lon").alias("lon"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.col("e.tag").alias("tags"),
        )
    if etype == "way":
        e = df.select(F.from_xml("xml", _WAY_SCHEMA, {"rowTag": "way"}).alias("e"))
        return e.select(
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform("e.nd", lambda n: n["_ref"]).alias("refs"),
            F.col("e.tag").alias("tags"),
        )
    if etype == "relation":
        e = df.select(
            F.from_xml("xml", _REL_SCHEMA, {"rowTag": "relation"}).alias("e")
        )
        return e.select(
            F.col("e._id").alias("id"),
            F.col("e._version").alias("version"),
            F.col("e._changeset").alias("changeset"),
            F.transform(
                "e.member",
                lambda m: F.struct(
                    m["_type"].alias("type"),
                    m["_ref"].alias("ref"),
                    m["_role"].alias("role"),
                ),
            ).alias("members"),
            F.col("e.tag").alias("tags"),
        )
    if etype == "bounds":
        sch = (
            "struct<_minlat:double,_minlon:double,"
            "_maxlat:double,_maxlon:double>"
        )
        e = df.select(F.from_xml("xml", sch, {"rowTag": "bounds"}).alias("e"))
        return e.select(
            F.col("e._minlat").alias("minlat"),
            F.col("e._minlon").alias("minlon"),
            F.col("e._maxlat").alias("maxlat"),
            F.col("e._maxlon").alias("maxlon"),
        )
    raise ValueError(
        f"parse_elements: no typed schema for {etype!r} here — "
        "changeset/note/user bodies parse via sources/osmapi.py"
    )
