"""Splittable bzip2 source (sources/bzip2.py).

The reference reads .osm.bz2 through one sequential bzip2.NewReader
(osmxml/scanner_test.go:163-230); these tests pin the parallel
re-expression: bit-aligned block discovery, standalone block decode
(re-wrapped one-block streams with the block CRC as combined CRC),
exactly-once ownership across arbitrary raw-byte splits, multistream
(pbzip2) files, and the two-level XML element ownership on top.
"""

import bz2
import os

import pytest

from osm_spark.sources.bzip2 import (
    BLOCK,
    EOS,
    _extract_bits,
    _iter_task_blocks,
    read_bz2_blocks,
    read_osm_xml_bz2,
    scan_magics,
    wrap_block,
)
from osm_spark.sources.xmlfile import iter_elements


def _xml_doc(n: int) -> bytes:
    rows = []
    for i in range(n):
        if i % 7 == 3:
            nds = "".join(f'<nd ref="{i + k}"/>' for k in range(4))
            rows.append(
                f'<way id="{i}" version="2" changeset="{i * 3}">'
                f"{nds}<tag k=\"highway\" v=\"x&gt;y\"/></way>"
            )
        else:
            rows.append(
                f'<node id="{i}" lat="{i % 90}.5" lon="-{i % 180}.25" '
                f'version="1" changeset="{i * 2}"/>'
            )
    return (
        b'<?xml version="1.0"?>\n<osm version="0.6">\n'
        + "\n".join(rows).encode()
        + b"\n</osm>\n"
    )


def _compress_blocks(data: bytes, level: int = 1) -> bytes:
    c = bz2.BZ2Compressor(level)
    return c.compress(data) + c.flush()


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("bz2src")
    doc = _xml_doc(18000)  # ~900 KB -> ~9 level-1 blocks
    path = str(d / "planet.osm.bz2")
    with open(path, "wb") as f:
        f.write(_compress_blocks(doc))
    return path, doc


def test_extract_bits():
    buf = bytes([0b10110100, 0b01100011, 0b11110000])
    assert _extract_bits(buf, 0, 8) == 0b10110100
    assert _extract_bits(buf, 3, 5) == 0b10100
    assert _extract_bits(buf, 5, 10) == 0b1000110001
    assert _extract_bits(buf, 6, 2) == 0b00


def test_scan_finds_every_block_and_eos(fixture):
    path, doc = fixture
    comp = open(path, "rb").read()
    hits = scan_magics(comp)
    kinds = [k for _, k in hits]
    assert kinds.count(EOS) == 1 and kinds[-1] == EOS
    assert kinds.count(BLOCK) >= 5  # multi-block fixture
    assert hits[0] == (32, BLOCK)  # first block right after BZh header
    # bit offsets are genuinely unaligned somewhere
    assert any(p % 8 for p, _ in hits)


def test_standalone_block_decode_roundtrip(fixture):
    path, doc = fixture
    comp = open(path, "rb").read()
    hits = scan_magics(comp)
    out = b""
    for (p, k), (q, _) in zip(hits, hits[1:]):
        assert k == BLOCK
        out += bz2.decompress(wrap_block(comp, p, q))
    assert out == doc


def test_wrap_block_detects_corruption(fixture):
    path, _ = fixture
    comp = bytearray(open(path, "rb").read())
    hits = scan_magics(bytes(comp))
    p, q = hits[0][0], hits[1][0]
    comp[(p // 8) + 200] ^= 0xFF  # flip payload bits inside block 0
    with pytest.raises((OSError, EOFError, ValueError)):
        bz2.decompress(wrap_block(bytes(comp), p, q))


@pytest.mark.parametrize("split_bytes", [1 << 10, 7_777, 1 << 20])
def test_exactly_once_ownership(fixture, split_bytes):
    path, doc = fixture
    size = os.path.getsize(path)
    got = b""
    for start in range(0, size, split_bytes):
        for owned, d in _iter_task_blocks(
            path, start, min(start + split_bytes, size), size, step=2048
        ):
            if not owned:
                break
            got += d
    assert got == doc


def test_multistream_pbzip2_shape(tmp_path):
    a, b = _xml_doc(4000), _xml_doc(2500)
    comp = _compress_blocks(a, 1) + _compress_blocks(b, 9)
    path = str(tmp_path / "ms.osm.bz2")
    with open(path, "wb") as f:
        f.write(comp)
    got = b""
    for owned, d in _iter_task_blocks(path, 0, len(comp), len(comp)):
        assert owned
        got += d
    assert got == a + b


def test_read_bz2_blocks_spark(spark, fixture):
    path, doc = fixture
    rows = (
        read_bz2_blocks(spark, path, split_bytes=4 << 10)
        .orderBy("split", "seq")
        .collect()
    )
    assert b"".join(r.data for r in rows) == doc
    assert len(rows) >= 5


def test_read_osm_xml_bz2_elementwise(spark, fixture):
    path, doc = fixture
    got = sorted(
        (r.etype, r.xml)
        for r in read_osm_xml_bz2(spark, path, split_bytes=3 << 10).collect()
    )
    want = sorted(
        (t, doc[s:e].decode()) for t, s, e in iter_elements(doc)
    )
    assert got == want and len(want) == 18000
