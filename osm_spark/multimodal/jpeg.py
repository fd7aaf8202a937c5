"""Baseline JPEG (ITU-T.81 sequential DCT) — pure numpy + struct.

A REAL, spec-compliant baseline JPEG codec with zero dependencies:

- encoder: level shift -> 8x8 float DCT-II (orthonormal matrix form) ->
  quantize -> zigzag -> DC-diff/AC-run-length huffman coding -> a
  marker stream (SOI, DQT, SOF0, DHT, SOS, EOI) with 0xFF byte
  stuffing. Grayscale (1 component) or YCbCr 4:4:4 (3 components,
  JFIF color transform).
- decoder: general marker parse (any DQT/DHT layout, multi-table),
  canonical huffman reconstruction from DHT BITS/HUFFVAL, interleaved
  MCU decode with arbitrary integer sampling factors (4:4:4, 4:2:0,
  4:2:2 layouts), dequantize, IDCT, replication upsample, level shift
  + clip, YCbCr->RGB.

The huffman tables the ENCODER emits are deliberately simple (flat
8-bit AC codes, 4-bit DC codes) — JPEG embeds tables in DHT, so any
prefix code is spec-valid and external decoders can read the output;
production encoders would ship Annex-K or optimized tables for better
compression, which changes NOTHING structurally. The decoder handles
arbitrary baseline tables (it rebuilds codes canonically from BITS),
not just the encoder's.

The encoder writes 4:4:4 by default; ``subsample=True`` switches color
images to 4:2:0 (2x2-averaged chroma, interleaved 16x16 MCUs). Not
implemented (documented, raises): progressive DCT (SOF2), arithmetic
coding, restart intervals, 12-bit precision.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- 8x8 DCT
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)


def dct2(block: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II of an 8x8 block."""
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ---------------------------------------------------------------- zigzag
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(ZIGZAG)

# default quantization tables (flat — quality knob not the point; any
# table is valid, it travels in DQT)
QTAB_LUMA = np.full(64, 8, dtype=np.int32)
QTAB_CHROMA = np.full(64, 8, dtype=np.int32)


# ------------------------------------------------------- huffman tables
def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """BITS (count of codes per length 1..16) + HUFFVAL -> value ->
    (code, length), canonical per T.81 Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# encoder-side tables: DC categories 0..11 as 4-bit codes; AC symbols
# (EOB, ZRL, all run/size pairs) as flat 8-bit codes
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amp_bits(v: int, cat: int) -> int:
    # negative amplitudes code as v - 1 in cat low bits (T.81 F.1.2.1)
    return v if v >= 0 else v + (1 << cat) - 1


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    code, ln = _ENC_DC[cat]
    w.write(code, ln)
    if cat:
        w.write(_amp_bits(diff, cat), cat)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _ENC_AC[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = _ENC_AC[(run << 4) | cat]
        w.write(code, ln)
        w.write(_amp_bits(v, cat), cat)
        run = 0
    if last_nz < 63:
        code, ln = _ENC_AC[0x00]  # EOB
        w.write(code, ln)
    return dc


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in table)
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(comps: np.ndarray) -> np.ndarray:
    y, cb, cr = (comps[:, :, i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _pad_plane(p: np.ndarray, H: int, W: int) -> np.ndarray:
    """Edge-replicate to (H, W)."""
    h, w = p.shape
    pp = np.empty((H, W))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _quantize_block(block: np.ndarray, qzz: np.ndarray) -> np.ndarray:
    coef = dct2(block)
    # DQT tables travel in zigzag order (T.81 B.2.4.1): bring to
    # natural order to quantize, then zigzag the quantized coefs
    return np.round(coef.flatten() / qzz[_UNZIGZAG]).astype(np.int64)[ZIGZAG]


def encode_jpeg(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 -> baseline JPEG bytes
    (flat quant, DHT-embedded simple huffman tables). ``subsample``
    switches color images from 4:4:4 to 4:2:0 (luma 2x2 sampling,
    chroma downsampled by 2x2 averaging, interleaved 16x16 MCUs)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qtabs = [QTAB_LUMA, QTAB_CHROMA]
    if gray:
        planes = [pixels.astype(np.float64)]
        qids = [0]
        samps = [(1, 1)]
    else:
        if pixels.shape[2] != 3:
            raise ValueError("expected (h, w, 3) RGB or (h, w) grayscale")
        ycc = _rgb_to_ycbcr(pixels)
        if subsample:
            # 4:2:0 — chroma averaged over 2x2; luma samp 2x2
            H2 = (h + 1) & ~1
            W2 = (w + 1) & ~1
            yp = _pad_plane(ycc[:, :, 0], H2, W2)
            chroma = [
                _pad_plane(ycc[:, :, i], H2, W2)
                .reshape(H2 // 2, 2, W2 // 2, 2)
                .mean(axis=(1, 3))
                for i in (1, 2)
            ]
            planes = [yp, chroma[0], chroma[1]]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[:, :, i] for i in range(3)]
            samps = [(1, 1)] * 3
        qids = [0, 1, 1]
    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    # pad each component plane to its own MCU-aligned block multiple
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (hi, vi), p in zip(samps, planes):
        padded.append(_pad_plane(p, mcus_y * 8 * vi, mcus_x * 8 * hi))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, qtabs[0])
    if not gray:
        out += _dqt_segment(1, qtabs[1])
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        zz = _quantize_block(block, qtabs[qids[ci]])
                        preds[ci] = _encode_block(bw, zz, preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode
class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, cat: int) -> int:
    # T.81 F.2.2.1 EXTEND
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_huffman(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in scan")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB or (h, w) grayscale.
    Handles arbitrary baseline DQT/DHT layouts and interleaved MCUs
    with arbitrary integer sampling factors (4:4:4 / 4:2:0 / 4:2:2 —
    the paired encoder emits 4:4:4, or 4:2:0 when subsample=True);
    progressive/arithmetic raise."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    h = w = None
    scan_comps = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nval])
                canon = _canonical_codes(bits, vals)
                htabs[(tc, th)] = {
                    (lnn, code): v for v, (code, lnn) in canon.items()
                }
                off += 17 + nval
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential DCT (SOF0) is supported"
            )
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tsel = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            break
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    r = _BitReader(buf[pos:])
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    samp = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    qsel = {cid: tq for cid, _, _, tq in comps}
    comp_order = [cid for cid, _, _, _ in comps]
    planes = {
        cid: np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi))
        for cid, hi, vi, _ in comps
    }
    preds = {cid: 0 for cid in comp_order}

    def decode_block(tdc: int, tac: int, cid: int) -> np.ndarray:
        sym = _decode_huffman(r, htabs[(0, tdc)])
        diff = _extend(r.bits(sym), sym) if sym else 0
        preds[cid] += diff
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = preds[cid]
        k = 1
        while k < 64:
            rs = _decode_huffman(r, htabs[(1, tac)])
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            cat = rs & 0xF
            zz[k] = _extend(r.bits(cat), cat)
            k += 1
        # zz and the DQT table are BOTH zigzag-ordered: dequantize
        # elementwise, then reorder to natural
        coef = (zz * qtabs[qsel[cid]])[_UNZIGZAG].reshape(8, 8)
        return idct2(coef) + 128.0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, tdc, tac in scan_comps:
                hi, vi = samp[cid]
                for byy in range(vi):
                    for bxx in range(hi):
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = decode_block(
                            tdc, tac, cid
                        )

    # upsample subsampled components by pixel replication, crop to (h, w)
    full = []
    for cid in comp_order:
        hi, vi = samp[cid]
        p = planes[cid]
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=2))
