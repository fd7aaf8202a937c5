"""Streaming XML file source: byte-range split exactness, compressed
single-split path, typed parse — reference osmxml/scanner.go:34-125
(bz2 path scanner_test.go:163-230)."""

import bz2
import gzip
import random

from osm_spark.sources.xmlfile import (
    iter_elements, parse_elements, read_osm_xml, scan_xml_bytes,
)


def _doc() -> bytes:
    return (
        b'<?xml version="1.0"?>\n<osm version="0.6">\n'
        b'<bounds minlat="1.0" minlon="2.0" maxlat="3.0" maxlon="4.0"/>\n'
        b'<node id="1" lat="1.5" lon="2.5" version="1" changeset="9"/>\n'
        b"<!-- a comment mentioning <node id=\"666\"/> that must not scan -->\n"
        b'<node id="2" lat="0.5" lon="0.25" version="2" changeset="9">'
        b'<tag k="name" v="a>b"/></node>\n'
        b'<way id="3" version="1" changeset="10"><nd ref="1"/><nd ref="2"/>'
        b'<tag k="highway" v="x"/></way>\n'
        b'<relation id="4" version="1" changeset="11">'
        b'<member type="way" ref="3" role="outer"/></relation>\n'
        b"</osm>\n"
    )


def test_iter_elements_masks_comments_and_handles_gt_in_attrs():
    tags = [t for t, _, _ in iter_elements(_doc())]
    assert tags == ["bounds", "node", "node", "way", "relation"]
    # limit: only elements STARTING before the cut
    data = _doc()
    first_way = data.find(b"<way")
    tags = [t for t, s, _ in iter_elements(data, limit=first_way)]
    assert tags == ["bounds", "node", "node"]


def test_scan_and_typed_parse(spark):
    snip = scan_xml_bytes(spark, _doc())
    nodes = parse_elements(snip, "node").collect()
    assert sorted((n.id, n.lat, n.version) for n in nodes) == [
        (1, 1.5, 1), (2, 0.5, 2),
    ]
    n2 = next(n for n in nodes if n.id == 2)
    assert [(t["_k"], t["_v"]) for t in n2.tags] == [("name", "a>b")]
    w = parse_elements(snip, "way").collect()[0]
    assert (w.id, list(w.refs)) == (3, [1, 2])
    r = parse_elements(snip, "relation").collect()[0]
    assert [(m["type"], m["ref"], m["role"]) for m in r.members] == [
        ("way", 3, "outer")
    ]
    b = parse_elements(snip, "bounds").collect()[0]
    assert (b.minlat, b.maxlon) == (1.0, 4.0)


def _big_doc(n: int, seed: int = 7) -> bytes:
    """n nodes + n//10 ways with variable-length tag payloads so split
    boundaries land everywhere: starts, attrs, text, children."""
    rng = random.Random(seed)
    parts = [b'<osm version="0.6">\n']
    for i in range(n):
        pad = "x" * rng.randrange(0, 120)
        parts.append(
            f'<node id="{i}" lat="{i * 0.001}" lon="{-i * 0.002}" '
            f'version="{i % 7 + 1}" changeset="{i * 3}">'
            f'<tag k="p" v="{pad}"/></node>\n'.encode()
        )
        if i % 10 == 0:
            nds = "".join(f'<nd ref="{i + j}"/>' for j in range(4))
            parts.append(
                f'<way id="{10 ** 6 + i}" version="1" '
                f'changeset="{i}">{nds}</way>\n'.encode()
            )
    parts.append(b"</osm>\n")
    return b"".join(parts)


def test_multisplit_scan_is_exact(spark, tmp_path):
    """Every element parses exactly once regardless of where the byte
    ranges cut (ownership = start offset; tasks overrun to finish)."""
    data = _big_doc(1500)
    p = tmp_path / "planet.osm"
    p.write_bytes(data)
    # ~16 splits with tiny ranges AND a tiny read step to force many
    # extension rounds across element boundaries
    snip = read_osm_xml(spark, str(p), split_bytes=10_000, read_step=256)
    counts = {
        r["etype"]: r["count"]
        for r in snip.groupBy("etype").count().collect()
    }
    assert counts == {"node": 1500, "way": 150}
    nodes = parse_elements(snip, "node")
    got = sorted(r.id for r in nodes.select("id").collect())
    assert got == list(range(1500))
    # spot-check a payload survives intact
    row = nodes.where("id = 1234").collect()[0]
    assert (row.lat, row.version, row.changeset) == (1.234, 1234 % 7 + 1, 3702)


def test_compressed_single_split(spark, tmp_path):
    data = _big_doc(300)
    for ext, comp in (("gz", gzip.compress), ("bz2", bz2.compress)):
        p = tmp_path / f"planet.osm.{ext}"
        p.write_bytes(comp(data))
        snip = read_osm_xml(spark, str(p))
        assert snip.rdd.getNumPartitions() == 1
        assert parse_elements(snip, "node").count() == 300
        assert parse_elements(snip, "way").count() == 30
