"""JPEG (ITU-T.81 huffman DCT, sequential + progressive) — pure numpy.

A REAL, spec-compliant JPEG codec with zero dependencies:

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
images to 4:2:0 (2x2-averaged chroma, interleaved 16x16 MCUs).

Progressive (SOF2, T.81 Annex G): decode_jpeg is a multi-scan
coefficient-domain engine handling spectral selection + successive
approximation (all four scan types — DC/AC x first/refine, including
the EOB-run + correction-bit AC refinement of G.1.2.3) and DRI/RSTn
restart intervals; encode_jpeg_progressive emits a full
successive-approximation scan script whose quantized coefficients are
identical to encode_jpeg's, making baseline-vs-progressive decode
byte-equality the roundtrip oracle. Not implemented (documented,
raises): arithmetic coding, lossless/hierarchical modes, 12-bit
precision, 16-bit quant tables.
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


# ----------------------------------------------------- progressive encode
# Flat canonical tables for progressive scans: every JPEG table travels
# in DHT, so a flat prefix code is spec-valid; progressive AC scans use
# EOBn symbols (r<<4 for r 0..14) that the baseline table lacks, and a
# flat 9-bit table over all 256 symbols covers every (r, s) pair.
_DC_FLAT_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_FLAT_VALS = list(range(16))
# 256 symbols split 128@len8 + 128@len9 (a BITS byte caps at 255;
# kraft sum 128/256 + 128/512 = 0.75 <= 1, canonical-valid)
_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))
_ENC_DC_FLAT = _canonical_codes(_DC_FLAT_BITS, _DC_FLAT_VALS)
_ENC_AC_FLAT = _canonical_codes(_AC_FLAT_BITS, _AC_FLAT_VALS)


def _component_coefs(pixels: np.ndarray, subsample: bool):
    """Shared encoder prep: color transform, optional 4:2:0, MCU
    padding, per-block quantized zigzag coefficients. Returns (gray, h,
    w, qids, samps, coefs, mcus_x, mcus_y) with coefs[ci] an int64
    (blocks_y, blocks_x, 64) array over the MCU-padded grid."""
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
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = []
    for (hi, vi), p, qi in zip(samps, planes, qids):
        by, bx = mcus_y * vi, mcus_x * hi
        padded = _pad_plane(p, by * 8, bx * 8)
        c = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                block = padded[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] - 128.0
                c[yb, xb] = _quantize_block(block, qtabs[qi])
        coefs.append(c)
    return gray, h, w, qids, samps, coefs, mcus_x, mcus_y


class _ScanWriter:
    """Entropy writer for one progressive scan: bit writing + deferred
    EOB-run / correction-bit buffers + restart markers."""

    def __init__(self, enc_ac, restart_interval: int = 0):
        self.bw = _BitWriter()
        self.enc_ac = enc_ac
        self.ri = restart_interval
        self.units = 0  # MCUs (interleaved) or blocks since last RST
        self.rst = 0
        self.eobrun = 0
        self.brbuf: list[int] = []

    def write(self, code: int, length: int) -> None:
        self.bw.write(code, length)

    def flush_eob(self) -> None:
        """emit_eobrun: EOBn symbol + extension bits + the correction
        bits buffered across the run (T.81 G.1.2.2-3)."""
        if self.eobrun:
            rr = self.eobrun.bit_length() - 1
            code, ln = self.enc_ac[rr << 4]
            self.bw.write(code, ln)
            if rr:
                self.bw.write(self.eobrun - (1 << rr), rr)
            self.eobrun = 0
        for b in self.brbuf:
            self.bw.write(b, 1)
        self.brbuf = []

    def unit_done(self) -> None:
        """Advance the restart counter; emit RSTn at interval
        boundaries (byte-aligned, unstuffed, preds/EOB state reset by
        the caller via the return value)."""
        self.units += 1
        self.needs_reset = False
        if self.ri and self.units % self.ri == 0:
            self.flush_eob()
            self.bw.flush()
            self.bw.buf += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8
            self.needs_reset = True

    def finish(self) -> bytes:
        self.flush_eob()
        self.bw.flush()
        return bytes(self.bw.buf)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive JPEG (SOF2, T.81 Annex G) with full successive
    approximation: DC first (Al=1) -> DC refine, then per component and
    spectral band AC first (Al=1) -> AC refine. The quantized
    coefficients are identical to encode_jpeg's, so decode_jpeg's
    output is byte-identical between the two encodings — that equality
    is the roundtrip oracle. ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs/blocks in every scan."""
    gray, h, w, qids, samps, coefs, mcus_x, mcus_y = _component_coefs(
        pixels, subsample
    )
    ncomp = len(coefs)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, QTAB_LUMA)
    if not gray:
        out += _dqt_segment(1, QTAB_CHROMA)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_FLAT_BITS, _DC_FLAT_VALS)
    out += _dht_segment(1, 0, _AC_FLAT_BITS, _AC_FLAT_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    # ---- scan 1: DC first, interleaved, Al=1 ----
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    sw = _ScanWriter(_ENC_AC_FLAT, restart_interval)
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        v = int(coefs[ci][my * vi + byy, mx * hi + bxx, 0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        cat = _category(diff)
                        code, ln = _ENC_DC_FLAT[cat]
                        sw.write(code, ln)
                        if cat:
                            sw.write(_amp_bits(diff, cat), cat)
            sw.unit_done()
            if sw.needs_reset:
                preds = [0] * ncomp
    out += sw.finish()

    # ---- scan 2: DC refine, Ah=1 -> Al=0 (raw bits) ----
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    sw = _ScanWriter(_ENC_AC_FLAT, restart_interval)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        sw.write(
                            int(coefs[ci][my * vi + byy, mx * hi + bxx, 0])
                            & 1,
                            1,
                        )
            sw.unit_done()
    out += sw.finish()

    def comp_blocks(ci):
        """Non-interleaved scan raster: the component's OWN block dims
        (A.2.2), not the MCU-padded grid."""
        hi, vi = samps[ci]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        for yb in range(-(-ch // 8)):
            for xb in range(-(-cw // 8)):
                yield coefs[ci][yb, xb]

    # ---- AC first scans per component/band, Al=1 ----
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 0, 1)
            sw = _ScanWriter(_ENC_AC_FLAT, restart_interval)
            for blk in comp_blocks(ci):
                run = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t = abs(v) >> 1
                    if t == 0:
                        run += 1
                        continue
                    sw.flush_eob()
                    while run > 15:
                        code, ln = _ENC_AC_FLAT[0xF0]
                        sw.write(code, ln)
                        run -= 16
                    cat = _category(t)
                    code, ln = _ENC_AC_FLAT[(run << 4) | cat]
                    sw.write(code, ln)
                    sw.write(_amp_bits(t if v > 0 else -t, cat), cat)
                    run = 0
                if run > 0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eob()
                sw.unit_done()
            out += sw.finish()

    # ---- AC refine scans per component/band, Ah=1 -> Al=0 ----
    # (T.81 G.1.2.3 encoder: newly-significant coefficients code as
    # (run-of-zero-HISTORY)<<4|1 + sign bit; coefficients already
    # nonzero in earlier scans contribute buffered correction bits.)
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 1, 0)
            sw = _ScanWriter(_ENC_AC_FLAT, restart_interval)
            for blk in comp_blocks(ci):
                absv = [abs(int(blk[k])) for k in range(ss, se + 1)]
                eob = 0  # 1 past the last newly-significant index
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i + 1
                run = 0
                br: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i < eob:
                        sw.flush_eob()
                        code, ln = _ENC_AC_FLAT[0xF0]
                        sw.write(code, ln)
                        run -= 16
                        for b in br:
                            sw.write(b, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    sw.flush_eob()
                    code, ln = _ENC_AC_FLAT[(run << 4) | 1]
                    sw.write(code, ln)
                    sw.write(1 if int(blk[ss + i]) > 0 else 0, 1)
                    for b in br:
                        sw.write(b, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    sw.eobrun += 1
                    sw.brbuf.extend(br)
                    if sw.eobrun == 0x7FFF or len(sw.brbuf) > 930:
                        sw.flush_eob()
                sw.unit_done()
            out += sw.finish()

    out += b"\xff\xd9"
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

    def restart(self) -> None:
        """Consume an RSTn marker at a restart-interval boundary:
        discard pad bits to the byte boundary, skip the 2-byte marker
        (T.81 F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RSTn at restart interval")


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


def _find_entropy_end(buf: bytes, start: int) -> int:
    """First offset >= start of a marker that terminates entropy-coded
    data: 0xFF followed by anything except 0x00 stuffing or RSTn."""
    pos = start
    n = len(buf)
    while True:
        pos = buf.find(b"\xff", pos)
        if pos < 0 or pos >= n - 1:
            return n
        nxt = buf[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
            continue
        return pos


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Huffman DCT JPEG -> (h, w, 3) uint8 RGB or (h, w) grayscale.

    Multi-scan coefficient-domain engine: every scan (the single
    baseline SOF0/SOF1 scan, or a progressive SOF2 scan script with
    spectral selection + successive approximation, T.81 Annex G.1.2)
    accumulates into per-component zigzag coefficient stores; dequant +
    IDCT + upsample run ONCE at the end, vectorized over all blocks.
    Handles arbitrary DQT/DHT layouts (tables may be redefined between
    scans), interleaved MCUs with arbitrary integer sampling factors,
    non-interleaved progressive AC scans over component-own block dims
    (A.2.2), DRI/RSTn restart intervals, and the four progressive scan
    types (DC/AC x first/refine). Arithmetic coding, lossless,
    hierarchical, and 12-bit precision raise."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    h = w = None
    progressive = False
    dri = 0
    scans = []  # (scan_comps, Ss, Se, Ah, Al, htabs snapshot, dri, lo, hi)
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
        elif marker == 0xC4:  # DHT (may be redefined between scans)
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
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp_b, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp_b >> 4, samp_b & 0xF, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only huffman sequential (SOF0/SOF1) and progressive "
                "(SOF2) DCT are supported"
            )
        elif marker == 0xDA:  # SOS + entropy-coded data
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tsel = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            end = _find_entropy_end(buf, pos)
            scans.append((scan_comps, ss, se, ahal >> 4, ahal & 0xF,
                          dict(htabs), dri, pos, end))
            pos = end
    if comps is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    samp = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    qsel = {cid: tq for cid, _, _, tq in comps}
    comp_order = [cid for cid, _, _, _ in comps]
    coefs = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
        for cid, hi, vi, _ in comps
    }

    for scan_comps, ss, se, ah, al, tabs, ri, lo, hi_off in scans:
        _apply_scan(
            _BitReader(buf[lo:hi_off]), scan_comps, ss, se, ah, al, tabs,
            ri, progressive, coefs, samp, hmax, vmax, w, h, mcus_x, mcus_y,
        )

    # dequant + IDCT, vectorized over every block of each component
    full = []
    for cid in comp_order:
        c = coefs[cid]
        by, bx = c.shape[:2]
        deq = (c * qtabs[qsel[cid]])[:, :, _UNZIGZAG].reshape(by, bx, 8, 8)
        px = np.einsum("ij,ybjk,kl->ybil", _C.T, deq, _C) + 128.0
        p = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        hi, vi = samp[cid]
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=2))


def _apply_scan(
    r, scan_comps, ss, se, ah, al, htabs, dri, progressive,
    coefs, samp, hmax, vmax, w, h, mcus_x, mcus_y,
):
    """Decode one entropy-coded scan into the coefficient stores —
    baseline full-band, or one of the four progressive scan types
    (T.81 G.1.2: DC/AC x first/refine), with RSTn restart handling."""
    preds = {cid: 0 for cid, _, _ in scan_comps}
    state = {"eobrun": 0}

    def full_block(blk, tdc, tac, cid):
        sym = _decode_huffman(r, htabs[(0, tdc)])
        diff = _extend(r.bits(sym), sym) if sym else 0
        preds[cid] += diff
        blk[0] = preds[cid]
        k = 1
        tab = htabs[(1, tac)]
        while k < 64:
            rs = _decode_huffman(r, tab)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            cat = rs & 0xF
            blk[k] = _extend(r.bits(cat), cat)
            k += 1

    def dc_first(blk, tdc, tac, cid):
        sym = _decode_huffman(r, htabs[(0, tdc)])
        diff = _extend(r.bits(sym), sym) if sym else 0
        preds[cid] += diff
        blk[0] = preds[cid] << al

    def dc_refine(blk, tdc, tac, cid):
        if r.bit():
            blk[0] |= 1 << al

    def ac_first(blk, tdc, tac, cid):
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        k = ss
        tab = htabs[(1, tac)]
        while k <= se:
            rs = _decode_huffman(r, tab)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.bits(rr)
                break
            k += rr
            blk[k] = _extend(r.bits(s), s) << al
            k += 1

    def ac_refine(blk, tdc, tac, cid):
        # T.81 G.1.2.3 decode (the libjpeg decode_mcu_AC_refine shape):
        # newly-significant coefficients arrive as (zero-HISTORY
        # run)<<4|1 + sign bit; every already-nonzero coefficient passed
        # over consumes one correction bit.
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if state["eobrun"] == 0:
            tab = htabs[(1, tac)]
            while k <= se:
                rs = _decode_huffman(r, tab)
                rr, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if rr < 15:
                        state["eobrun"] = 1 << rr
                        if rr:
                            state["eobrun"] += r.bits(rr)
                        break
                    # rr == 15: ZRL — skip 16 zero-history positions
                else:
                    newval = p1 if r.bit() else m1
                while k <= se:
                    if blk[k]:
                        if r.bit() and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"]:
            while k <= se:
                if blk[k]:
                    if r.bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            state["eobrun"] -= 1

    if not progressive:
        per_block = full_block
    elif ss == 0:
        per_block = dc_first if ah == 0 else dc_refine
    else:
        per_block = ac_first if ah == 0 else ac_refine

    def restart():
        r.restart()
        for cid in preds:
            preds[cid] = 0
        state["eobrun"] = 0

    if len(scan_comps) > 1:
        # interleaved MCU order (multi-component scans: the baseline
        # single scan, or progressive DC scans with ns > 1)
        n_mcus = mcus_x * mcus_y
        done = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, tdc, tac in scan_comps:
                    hi, vi = samp[cid]
                    for byy in range(vi):
                        for bxx in range(hi):
                            per_block(
                                coefs[cid][my * vi + byy, mx * hi + bxx],
                                tdc, tac, cid,
                            )
                done += 1
                if dri and done % dri == 0 and done < n_mcus:
                    restart()
    else:
        # single-component scan is non-interleaved (A.2.2): raster over
        # the component's OWN block dims, NOT the MCU-padded grid; one
        # block per restart-counted MCU. Covers progressive AC scans,
        # single-comp progressive DC scans, baseline grayscale, and
        # baseline sequential per-component scans.
        cid, tdc, tac = scan_comps[0]
        hi, vi = samp[cid]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        bw_ = -(-cw // 8)
        bh_ = -(-ch // 8)
        done = 0
        n_blocks = bw_ * bh_
        for yb in range(bh_):
            for xb in range(bw_):
                per_block(coefs[cid][yb, xb], tdc, tac, cid)
                done += 1
                if dri and done % dri == 0 and done < n_blocks:
                    restart()
