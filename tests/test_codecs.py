"""BMP/WAV codec roundtrips (multimodal/codecs.py) — real file-format
parsing: headers, strides, padding, chunk walking."""

import numpy as np
import pytest

from osm_spark.multimodal import codecs as C


@pytest.mark.parametrize("w,h", [(4, 3), (5, 2), (7, 1), (6, 6), (1, 1)])
def test_bmp_roundtrip(w, h):
    # widths 5 and 7 exercise the 4-byte row padding
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = C.encode_bmp(img)
    assert buf[:2] == b"BM"
    out = C.decode_bmp(buf)
    np.testing.assert_array_equal(out, img)


def test_bmp_stride_math():
    # 5px * 3B = 15B rows pad to 16
    img = np.zeros((2, 5, 3), dtype=np.uint8)
    buf = C.encode_bmp(img)
    assert len(buf) == 54 + 2 * 16


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    buf = C.encode_wav(s, sample_rate=8000, channels=1)
    rate, ch, out = C.decode_wav(buf)
    assert (rate, ch) == (8000, 1)
    np.testing.assert_array_equal(out, s)


def test_wav_extra_chunk_tolerated():
    import struct

    s = np.arange(10, dtype=np.int16)
    buf = bytearray(C.encode_wav(s))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    buf2 = bytes(buf[:fmt_end]) + extra + bytes(buf[fmt_end:])
    buf2 = struct.pack("<4sI", b"RIFF", len(buf2) - 8) + buf2[8:]
    rate, ch, out = C.decode_wav(buf2)
    np.testing.assert_array_equal(out, s)


def test_sniff():
    img = C.encode_bmp(np.zeros((1, 1, 3), dtype=np.uint8))
    wav = C.encode_wav(np.zeros(4, dtype=np.int16))
    assert C.sniff(img) == "bmp"
    assert C.sniff(wav) == "wav"
    assert C.sniff(b"\x89PNG\r\n\x1a\n....") == "png"
    assert C.sniff(b"\xff\xd8\xff\xe0jfif") == "jpeg"
    assert C.sniff(b"ID3\x04mp3-ish") is None  # MP3: still stubbed


def test_resize_nearest():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    up = C.resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    np.testing.assert_array_equal(up[0, 0], img[0, 0])
    np.testing.assert_array_equal(up[3, 3], img[1, 1])
    down = C.resize_nearest(up, 2, 2)
    np.testing.assert_array_equal(down, img)


def test_compressed_raises_in_decode_features(spark):
    from osm_spark.multimodal.media import decode_features

    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04 an mp3 frame"))], "media_id long, blob binary"
    )
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        decode_features(df, real_decode=True).collect()


def test_png_roundtrip_all_filters():
    """Every scanline filter (the encoder rotates y % 5) must unfilter
    back to the exact pixels, RGB and grayscale, various widths."""
    import numpy as np

    from osm_spark.multimodal import codecs as C

    rng = np.random.default_rng(11)
    for shape in [(11, 13, 3), (7, 5, 3), (9, 4), (1, 1, 3), (6, 1), (5, 2, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = C.decode_png(C.encode_png(px))
        assert back.shape == px.shape
        assert (back == px).all(), shape


def test_png_decode_features_matches_bmp(spark):
    """The same pixels through PNG and BMP containers must produce
    identical decode_features rows (dims + histogram)."""
    import numpy as np

    from osm_spark.multimodal import codecs as C
    from osm_spark.multimodal.media import decode_features

    px = (np.arange(10 * 6 * 3) * 37 % 256).astype(np.uint8).reshape(6, 10, 3)
    df = spark.createDataFrame(
        [
            (1, bytearray(C.encode_png(px))),
            (2, bytearray(C.encode_bmp(px))),
        ],
        "media_id long, blob binary",
    )
    rows = {r.media_id: r for r in decode_features(df, real_decode=True).collect()}
    a, b = rows[1], rows[2]
    assert (a.width, a.height, a.channels, a.feature) == (
        b.width, b.height, b.channels, b.feature,
    )


def test_jpeg_roundtrip_lossy_bounds():
    """Full baseline pipeline: smooth gradients round-trip within small
    quantization error; dims/channels exact; DCT invertible to 1e-10."""
    import numpy as np

    from osm_spark.multimodal import jpeg as J

    rng = np.random.default_rng(3)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(J.idct2(J.dct2(b)), b, atol=1e-10)

    g = np.add.outer(np.arange(24) * 3, np.arange(40) * 2).astype(np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(g))
    assert back.shape == g.shape
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 12

    rgb = np.stack([
        np.add.outer(np.arange(17) * 5, np.arange(23) * 3) % 200,
        np.add.outer(np.arange(17) * 2, np.arange(23) * 7) % 200,
        np.full((17, 23), 100),
    ], axis=2).astype(np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(rgb))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 16


def test_jpeg_block_uniform_bit_exact():
    """Block-uniform images diagonalize the DCT -> the lossy codec is
    bit-exact (the property the media_jpeg oracle relies on)."""
    import numpy as np

    from osm_spark.multimodal import jpeg as J

    for v in (0, 1, 63, 64, 127, 128, 200, 255):
        u = np.full((8, 8), v, dtype=np.uint8)
        assert (J.decode_jpeg(J.encode_jpeg(u)) == v).all(), v
    blocks = (np.arange(6, dtype=np.uint8).reshape(2, 3) * 40 + 7)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    assert (J.decode_jpeg(J.encode_jpeg(img)) == img).all()


def test_jpeg_via_decode_features(spark):
    """JPEG blobs flow through the same mapInPandas decode path."""
    import numpy as np

    from osm_spark.multimodal import jpeg as J
    from osm_spark.multimodal.media import decode_features

    img = np.kron(
        np.array([[32, 96], [160, 224]], dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    df = spark.createDataFrame(
        [(1, bytearray(J.encode_jpeg(img)))], "media_id long, blob binary"
    )
    r = decode_features(df, real_decode=True).collect()[0]
    assert (r.width, r.height, r.channels) == (16, 16, 1)
    assert r.feature == [0, 64, 0, 64, 0, 64, 0, 64]


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 path: interleaved 16x16 MCUs, 2x2-averaged chroma,
    replication upsample; error bounded on smooth data, odd dims crop
    back exactly."""
    import numpy as np

    from osm_spark.multimodal import jpeg as J

    grad = np.add.outer(np.arange(33) * 2, np.arange(41) * 3) % 190
    rgb = np.stack([grad, grad, grad], axis=2).astype(np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(rgb, subsample=True))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 12

    rgb2 = np.stack([
        np.add.outer(np.arange(20) * 4, np.arange(28) * 2) % 180 + 30,
        np.add.outer(np.arange(20) * 1, np.arange(28) * 3) % 180 + 20,
        np.full((20, 28), 90),
    ], axis=2).astype(np.uint8)
    back2 = J.decode_jpeg(J.encode_jpeg(rgb2, subsample=True))
    assert np.abs(back2.astype(int) - rgb2.astype(int)).max() <= 24

    odd = np.stack(
        [np.full((13, 17), c) for c in (10, 200, 130)], axis=2
    ).astype(np.uint8)
    assert J.decode_jpeg(J.encode_jpeg(odd, subsample=True)).shape == odd.shape


def test_jpeg_progressive_matches_baseline():
    """Progressive (SOF2) and baseline (SOF0) encodings of the same
    pixels share quantized coefficients, so the multi-scan decoder must
    reconstruct BYTE-IDENTICAL pixels from both — across gray/color,
    4:4:4/4:2:0, non-multiple-of-8 dims, restart intervals, and band
    scripts. This exercises all four progressive scan types including
    the EOB-run + correction-bit AC refinement (T.81 G.1.2.3)."""
    import numpy as np

    from osm_spark.multimodal import jpeg as J

    rng = np.random.RandomState(7)
    cases = [
        ((24, 17, 3), False, 0, ((1, 5), (6, 63))),
        ((24, 17, 3), True, 0, ((1, 5), (6, 63))),
        ((16, 16), False, 0, ((1, 5), (6, 63))),
        ((33, 41, 3), True, 0, ((1, 63),)),
        ((48, 48, 3), True, 2, ((1, 5), (6, 63))),  # RSTn in every scan
        ((8, 8, 3), False, 0, ((1, 2), (3, 9), (10, 63))),
    ]
    for shape, sub, ri, bands in cases:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(px, subsample=sub))
        prog_bytes = J.encode_jpeg_progressive(
            px, subsample=sub, restart_interval=ri, bands=bands
        )
        assert prog_bytes[2:4] != b"\xff\xc0"  # really SOF2, not SOF0
        prog = J.decode_jpeg(prog_bytes)
        assert np.array_equal(base, prog), (shape, sub, ri, bands)

    # smooth gradient: long EOB runs across blocks (the EOBn > 1 path)
    g = np.clip(
        np.add.outer(np.arange(64), np.arange(64)) * 2, 0, 255
    ).astype(np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(g)),
        J.decode_jpeg(J.encode_jpeg_progressive(g)),
    )

    # block-uniform fixtures stay bit-exact through the progressive path
    u = np.full((16, 24), 137, dtype=np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive(u)) == u).all()


def test_gif_lzw_roundtrip_and_growth():
    import numpy as np

    from osm_spark.multimodal.codecs import decode_gif, encode_gif, sniff

    rng = np.random.RandomState(3)
    for _ in range(15):
        h, w = rng.randint(1, 30), rng.randint(1, 30)
        nbits = int(rng.choice([1, 2, 4, 8]))
        pal = (np.arange((1 << nbits) * 3) % 256).astype(
            np.uint8
        ).reshape(-1, 3)
        img = rng.randint(0, 1 << nbits, (h, w)).astype(np.uint8)
        blob = encode_gif(img, pal)
        assert sniff(blob) == "gif"
        idx, p2 = decode_gif(blob)
        assert (idx == img).all() and (p2 == pal).all()


def test_gif_overflow_reset_and_kwkwk():
    import numpy as np

    from osm_spark.multimodal.codecs import decode_gif, encode_gif

    pal = (np.arange(256 * 3) % 256).astype(np.uint8).reshape(-1, 3)
    # 90k pixels force the 4096-entry table reset (12-bit cap)
    img = (np.arange(300 * 300) * 7919 % 256).astype(
        np.uint8
    ).reshape(300, 300)
    idx, _ = decode_gif(encode_gif(img, pal))
    assert (idx == img).all()
    # runs of a single symbol drive the KwKwK (code == next_code) case
    pal2 = (np.arange(2 * 3) % 256).astype(np.uint8).reshape(-1, 3)
    img2 = np.zeros((5, 40), dtype=np.uint8)
    idx2, _ = decode_gif(encode_gif(img2, pal2))
    assert (idx2 == img2).all()
