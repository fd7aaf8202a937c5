"""Real media codecs for UNCOMPRESSED formats — pure numpy + struct.

The sandbox has no PIL/libvips/ffmpeg, but BMP (24-bit uncompressed)
and WAV (RIFF PCM16) need neither: their layouts are plain headers over
raw sample/pixel arrays. These are REAL codecs — byte-faithful headers,
bottom-up BGR rows with 4-byte padding for BMP, RIFF chunk walking for
WAV — so the engine's decode path is genuine for uncompressed media;
only compressed formats (JPEG/PNG/MP3/H.264) remain stubbed with a
clear error in media.decode_features.

Everything is vectorized: pixel/sample payloads move through numpy
views, no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------- BMP
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp uncompressed BMP (BITMAPINFOHEADER,
    bottom-up BGR rows, rows padded to 4 bytes)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """24bpp uncompressed BMP -> (h, w, 3) uint8 RGB (top-down)."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure indexing (the real resize op the
    pipeline needs for thumbnailing; no interpolation libs required)."""
    h, w = img.shape[:2]
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


# ------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """int16 samples (interleaved if multi-channel) -> RIFF PCM16 WAV."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF PCM16 WAV -> (sample_rate, channels, int16 samples). Walks
    chunks, so extra chunks (LIST/INFO) are tolerated."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = ch = None
    samples = None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_tag, ch, rate = struct.unpack_from("<HHI", buf, pos)
            bits = struct.unpack_from("<H", buf, pos + 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt_tag} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, ch, samples.astype(np.int16)


def sniff(buf: bytes) -> str | None:
    """'bmp' | 'wav' | None (unknown/compressed)."""
    buf = bytes(buf[:12])
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    return None
