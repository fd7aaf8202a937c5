"""WARC source tests: record grammar, writer/reader round trip, offset
split exactness, plain vs per-record-gzip, north-rule page projection."""

from __future__ import annotations

import gzip
import os

import pytest

from osm_spark.sources import warc as W


def _mk_records(n: int, payload_of=lambda i: f"<html>page {i}</html>".encode()):
    return [
        W.build_record(
            payload=payload_of(i),
            target_uri=f"https://crawl.example/doc/{i}",
            warc_date_epoch=1483228800 + i,
            record_id=f"<urn:uuid:{i:08d}-0000-4000-8000-000000000000>",
        )
        for i in range(n)
    ]


def test_record_grammar_and_parse_roundtrip():
    rec = _mk_records(1)[0]
    assert rec.startswith(b"WARC/1.0\r\n")
    assert rec.endswith(b"\r\n\r\n")
    p = W.parse_record(rec)
    assert p["warc_type"] == "response"
    assert p["target_uri"] == "https://crawl.example/doc/0"
    assert p["warc_date"] == "2017-01-01T00:00:00Z"
    assert p["content_length"] == len(b"<html>page 0</html>")
    assert p["payload"] == b"<html>page 0</html>"


def test_parse_record_header_names_case_insensitive():
    rec = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"CONTENT-LENGTH: 3\r\n"
        b"Warc-Target-Uri: http://x/\r\n"
        b"\r\nabc\r\n\r\n"
    )
    p = W.parse_record(rec)
    assert p["warc_type"] == "response"
    assert p["content_length"] == 3
    assert p["payload"] == b"abc"
    assert p["target_uri"] == "http://x/"


def test_payload_may_contain_warc_anchor_and_crlf():
    """Content-Length is authoritative — a payload containing the
    record terminator bytes and a WARC/ version line must not split the
    record."""
    evil = b"x\r\n\r\nWARC/1.0\r\ny"
    rec = W.build_record(payload=evil, warc_date_epoch=0)
    nxt = W.build_record(payload=b"after", warc_date_epoch=1)
    got = list(W._iter_plain(rec + nxt))
    assert [g["payload"] for g in got] == [evil, b"after"]


def test_writer_gzip_one_member_per_record(tmp_path):
    path = str(tmp_path / "t.warc.gz")
    W.write_warc(path, _mk_records(5))
    data = open(path, "rb").read()
    # 5 independent members: 5 magic headers at member starts walked by
    # the inflater, and gzip.decompress handles the concatenation
    assert gzip.decompress(data).count(b"WARC/1.0\r\n") == 5
    offs, off = [], 0
    with open(path, "rb") as f:
        while off < len(data):
            plain, consumed = W._inflate_member(f, off, 1 << 20)
            assert plain.startswith(b"WARC/")
            offs.append(off)
            off += consumed
    assert len(offs) == 5
    assert offs[0] == 0


def test_writer_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    W.write_warc(a, _mk_records(3))
    W.write_warc(b, _mk_records(3))
    assert open(a, "rb").read() == open(b, "rb").read()


def test_read_warc_gz_multisplit_exact(spark, tmp_path):
    """Every record decodes exactly once under splits far smaller than
    the file (boundaries land mid-member for most splits)."""
    path = str(tmp_path / "t.warc.gz")
    n = 200
    W.write_warc(path, _mk_records(n))
    size = os.path.getsize(path)
    split = max(size // 17, 64)  # 17-ish ranges, none aligned
    df = W.read_warc(spark, path, split_bytes=split)
    rows = df.collect()
    assert len(rows) == n
    uris = sorted(r.target_uri for r in rows)
    assert uris == sorted(f"https://crawl.example/doc/{i}" for i in range(n))
    by_uri = {r.target_uri: r for r in rows}
    r7 = by_uri["https://crawl.example/doc/7"]
    assert bytes(r7.payload) == b"<html>page 7</html>"
    assert r7.content_length == len(b"<html>page 7</html>")
    assert r7.warc_date == "2017-01-01T00:00:07Z"


def test_read_warc_split_smaller_than_member(spark, tmp_path):
    """Ranges so small that most contain NO member start must emit
    nothing (the owner split emits the member) — no duplicates, no
    loss."""
    big = lambda i: (f"<html>{'x' * 3000} page {i}</html>").encode()
    path = str(tmp_path / "big.warc.gz")
    W.write_warc(path, _mk_records(20, payload_of=big))
    df = W.read_warc(spark, path, split_bytes=256)
    rows = df.collect()
    assert len(rows) == 20
    assert sorted(bytes(r.payload) for r in rows) == sorted(big(i) for i in range(20))


def test_read_warc_plain_single_split(spark, tmp_path):
    path = str(tmp_path / "t.warc")
    W.write_warc(path, _mk_records(30), gzip_records=False)
    df = W.read_warc(spark, path)
    assert df.count() == 30
    assert df.rdd.getNumPartitions() == 1  # plain WARC never splits


def test_pages_from_warc_north_rule_shape(spark, tmp_path):
    path = str(tmp_path / "t.warc.gz")
    recs = _mk_records(3)
    # one non-response record that pages_from_warc must drop
    recs.append(W.build_record(payload=b"meta", warc_type="warcinfo",
                               warc_date_epoch=0))
    W.write_warc(path, recs)
    pages = W.pages_from_warc(W.read_warc(spark, path))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html"]
    assert dict((f.name, f.dataType.simpleString()) for f in pages.schema.fields) == {
        "url": "string", "warc_ts": "timestamp", "html": "binary",
    }
    rows = {r.url: r for r in pages.collect()}
    assert len(rows) == 3
    r = rows["https://crawl.example/doc/2"]
    assert bytes(r.html) == b"<html>page 2</html>"
    assert r.warc_ts.year == 2017


def test_inflate_member_rejects_false_magic(tmp_path):
    """Magic bytes inside compressed data must fail verification."""
    path = str(tmp_path / "t.warc.gz")
    W.write_warc(path, _mk_records(1))
    with open(path, "rb") as f:
        got = W._inflate_member(f, 5, 1 << 20)  # mid-member offset
    assert got is None


def test_parse_record_rejects_non_warc():
    with pytest.raises(ValueError):
        W.parse_record(b"HTTP/1.1 200 OK\r\n\r\n")


# ---------------------------------------------------------------------
# CDX offsets + random access
# ---------------------------------------------------------------------

def test_read_warc_with_offsets_gz(spark, tmp_path):
    path = str(tmp_path / "t.warc.gz")
    W.write_warc(path, _mk_records(10))
    df = W.read_warc(spark, path, split_bytes=512, with_offsets=True)
    rows = sorted(df.collect(), key=lambda r: r.member_offset)
    assert len(rows) == 10
    assert rows[0].member_offset == 0
    # members tile the file exactly: offsets are cumulative sizes
    for a, b in zip(rows, rows[1:]):
        assert b.member_offset == a.member_offset + a.member_size
    assert rows[-1].member_offset + rows[-1].member_size == os.path.getsize(path)


def test_read_warc_at_fetches_exact_records(spark, tmp_path):
    path = str(tmp_path / "t.warc.gz")
    W.write_warc(path, _mk_records(20))
    idx = W.cdx_index(W.read_warc(spark, path, with_offsets=True))
    pick = idx.where(idx.url.isin(
        "https://crawl.example/doc/3", "https://crawl.example/doc/17"))
    got = W.read_warc_at(spark, path, pick).collect()
    assert sorted(r.target_uri for r in got) == [
        "https://crawl.example/doc/17", "https://crawl.example/doc/3"]
    by = {r.target_uri: r for r in got}
    assert bytes(by["https://crawl.example/doc/3"].payload) == b"<html>page 3</html>"
    # digest recorded by the scan == digest of the pread bytes
    import hashlib
    d = {r.url: r.digest for r in pick.collect()}
    for r in got:
        assert hashlib.md5(bytes(r.payload)).hexdigest() == d[r.target_uri]


def test_read_warc_at_plain_file(spark, tmp_path):
    path = str(tmp_path / "t.warc")
    W.write_warc(path, _mk_records(6), gzip_records=False)
    idx = W.cdx_index(W.read_warc(spark, path, with_offsets=True))
    got = W.read_warc_at(spark, path, idx.limit(6)).collect()
    assert sorted(r.target_uri for r in got) == sorted(
        f"https://crawl.example/doc/{i}" for i in range(6))


# ---------------------------------------------------------------------
# Property tests: split exactness under adversarial records (no Spark —
# the walker is exercised directly, so hypothesis can afford many cases)
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# payloads that deliberately contain gzip magic bytes, WARC version
# lines, and record terminators
_adversarial = st.one_of(
    st.binary(min_size=0, max_size=400),
    st.just(b"\x1f\x8b\x08 fake gzip magic inside payload"),
    st.just(b"WARC/1.0\r\nContent-Length: 7\r\n\r\nnested\r\n\r\n"),
    st.just(b"\r\n\r\n" * 20),
    st.binary(min_size=2000, max_size=5000),
)


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(_adversarial, min_size=1, max_size=30),
    split_bytes=st.integers(min_value=16, max_value=4096),
)
def test_walk_members_exact_under_any_split(tmp_path_factory, payloads,
                                             split_bytes):
    """Every member decodes exactly once for ANY split size, regardless
    of payload content (magic bytes, fake WARC headers, terminators)."""
    path = str(tmp_path_factory.mktemp("w") / "t.warc.gz")
    recs = [
        W.build_record(payload=p, target_uri=f"https://x/{i}",
                       warc_date_epoch=i)
        for i, p in enumerate(payloads)
    ]
    W.write_warc(path, recs)
    size = os.path.getsize(path)
    got = []
    with open(path, "rb") as f:
        for start in range(0, size, split_bytes):
            end = min(start + split_bytes, size)
            for off, sz, plain in W._walk_members_buffered(
                f, start, end, read_step=64
            ):
                got.append((off, sz, plain))
    assert len(got) == len(recs)
    # offsets tile the file exactly, in order, no dup/loss
    got.sort()
    pos = 0
    for (off, sz, plain), p in zip(got, payloads):
        assert off == pos
        pos += sz
        assert W.parse_record(plain)["payload"] == p
    assert pos == size


@settings(max_examples=25, deadline=None)
@given(payloads=st.lists(_adversarial, min_size=1, max_size=20))
def test_iter_plain_exact(payloads):
    recs = [W.build_record(payload=p, warc_date_epoch=i)
            for i, p in enumerate(payloads)]
    out = list(W._iter_plain(b"".join(recs)))
    assert [r["payload"] for r in out] == payloads
