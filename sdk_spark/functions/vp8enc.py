"""Minimal VP8 (lossy WebP) key-frame encoder — pure Python/numpy.

The bitstream-simplest conformant encoder: one token partition, no
segmentation, loop filter level 0, no skip flags, no probability
updates, every macroblock coded as 16x16 DC-prediction intra with a Y2
block.  Compression is therefore modest (default token probabilities),
but the output is a fully valid RFC 6386 key frame: the engine's
bit-exact decoder (``vp8.py``) and the system libwebp decode it to
identical pixels (asserted in tests/test_vp8.py).

Purpose: deterministic *lossy* WebP fixtures for the synthetic image
table (``sources/images.py``) without any codec library — the lossy
decode path (the dominant real-crawl format) then gets exercised by the
image-validation tier end-to-end, PSNR invariant included.

Closed-loop design: the encoder reconstructs each macroblock with the
decoder's own integer transforms (``_idct4x4``/``_iwht4x4``) and
prediction, so encoder-side neighbor context is bit-identical to any
conformant decoder's.
"""
from __future__ import annotations

import numpy as np

from .vp8 import (_idct4x4, _iwht4x4, _pred_16_or_8, DC_PRED,
                  KF_YMODE_TREE, KF_YMODE_PROB, UV_MODE_TREE,
                  KF_UV_MODE_PROB, COEFF_TREE, CAT_PROBS, CAT_BASE,
                  _BANDS, _ZIGZAG, _clamp_q)
from .vp8_tables import (AC_QLOOKUP, COEFF_PROBS, COEFF_UPDATE_PROBS,
                         DC_QLOOKUP)


# ---------------------------------------------------------------------------
# boolean arithmetic encoder (RFC 6386 section 7 / libvpx bool coder)
# ---------------------------------------------------------------------------

class _BoolEnc:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.put(128, (value >> i) & 1)

    def finish(self) -> bytes:
        # flushing 32 encoded zero-bits pushes all decision state out
        # (libvpx vp8_stop_encode does exactly this)
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


def _tree_paths(tree: tuple) -> dict:
    """symbol -> [(prob_index, bit), ...] for a RFC-style tree array."""
    paths: dict[int, list] = {}

    def walk(i, acc):
        for bit in (0, 1):
            t = tree[i + bit]
            step = acc + [(i >> 1, bit)]
            if t <= 0:
                paths[-t] = step
            else:
                walk(t, step)

    walk(0, [])
    return paths


_COEFF_PATHS = _tree_paths(COEFF_TREE)
_YMODE_PATHS = _tree_paths(KF_YMODE_TREE)
_UV_PATHS = _tree_paths(UV_MODE_TREE)


def _tree_write(b: _BoolEnc, paths: dict, probs, symbol: int,
                skip_first: bool = False):
    for k, (pi, bit) in enumerate(paths[symbol]):
        if skip_first and k == 0:
            continue
        b.put(probs[pi], bit)


# ---------------------------------------------------------------------------
# forward transforms: exact algebraic inverses of the decoder's integer
# iDCT/iWHT bases (closed loop absorbs the rounding)
# ---------------------------------------------------------------------------

_K1 = 20091 / 65536.0
_K2 = 35468 / 65536.0
_MI = np.array([
    [1, 1 + _K1, 1, _K2],
    [1, _K2, -1, -(1 + _K1)],
    [1, -_K2, -1, 1 + _K1],
    [1, -(1 + _K1), 1, -_K2],
])
_FDCT = np.linalg.inv(_MI)        # X = Mi C Mi^T / 8  =>  C = 8 inv X inv^T

_MW = np.array([
    [1, 1, 1, 1],
    [1, 1, -1, -1],
    [1, -1, -1, 1],
    [1, -1, 1, -1],
])


def _fdct4x4(x: np.ndarray) -> np.ndarray:
    c = 8.0 * (_FDCT @ x.astype(np.float64) @ _FDCT.T)
    return np.round(c).astype(np.int64)


def _fwht4x4(x: np.ndarray) -> np.ndarray:
    # iwht: X = M c M^T / 8 with M^T M = 4 I  =>  c = M^T X M / 2
    return np.round((_MW.T @ x.astype(np.float64) @ _MW) / 2.0
                    ).astype(np.int64)


# ---------------------------------------------------------------------------
# token writing (RFC 6386 section 13) with default probabilities
# ---------------------------------------------------------------------------

def _write_coeffs(b: _BoolEnc, block_type: int, ctx: int, first: int,
                  qcoeffs: np.ndarray) -> bool:
    """Write one 4x4 block's quantized coefficients (raster order).

    Mirrors the decoder contexts; returns the has-nonzero flag."""
    tp = COEFF_PROBS[block_type]
    scan_vals = [int(qcoeffs[_ZIGZAG[n]]) for n in range(16)]
    last = -1
    for n in range(first, 16):
        if scan_vals[n]:
            last = n
    nz = last >= first
    n = first
    prev_zero = False
    while n < 16:
        p = tp[_BANDS[n]][ctx]
        if n > last:
            # EOB never follows a DCT_0 token: trailing zeros after the
            # last nonzero are simply not coded, so prev_zero is False
            _tree_write(b, _COEFF_PATHS, p, 11)
            break
        v = scan_vals[n]
        a = abs(v)
        if a == 0:
            _tree_write(b, _COEFF_PATHS, p, 0, skip_first=prev_zero)
            ctx = 0
            prev_zero = True
            n += 1
            continue
        if a <= 4:
            _tree_write(b, _COEFF_PATHS, p, a, skip_first=prev_zero)
        else:
            for cat in range(6):
                hi = CAT_BASE[cat + 1] - 1 if cat < 5 else 2114
                if a <= hi:
                    break
            _tree_write(b, _COEFF_PATHS, p, 5 + cat,
                        skip_first=prev_zero)
            extra = a - CAT_BASE[cat]
            cps = CAT_PROBS[cat]
            for i, cp in enumerate(cps):
                b.put(cp, (extra >> (len(cps) - 1 - i)) & 1)
        b.put(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        prev_zero = False
        n += 1
    return nz


# ---------------------------------------------------------------------------
# colorspace
# ---------------------------------------------------------------------------

def rgb_to_yuv420(img: np.ndarray):
    """BT.601 limited-range RGB -> YUV 4:2:0 (2x2 box chroma)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + 0.257 * r + 0.504 * g + 0.098 * b
    u = 128.0 - 0.148 * r - 0.291 * g + 0.439 * b
    v = 128.0 + 0.439 * r - 0.368 * g - 0.071 * b
    h, w = y.shape
    ph, pw = (h + 1) & ~1, (w + 1) & ~1
    up = np.pad(u, ((0, ph - h), (0, pw - w)), mode="edge")
    vp = np.pad(v, ((0, ph - h), (0, pw - w)), mode="edge")
    u2 = (up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2]
          + up[1::2, 1::2]) / 4.0
    v2 = (vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2]
          + vp[1::2, 1::2]) / 4.0
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u2), clip(v2)


# ---------------------------------------------------------------------------
# encoder main loop
# ---------------------------------------------------------------------------

def _quant_block(coeffs: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    q = np.empty(16, dtype=np.int64)

    def rnd(c, d):          # round-to-nearest, symmetric around zero
        a = abs(int(c))
        return ((a + d // 2) // d) * (1 if c >= 0 else -1)

    q[0] = rnd(coeffs[0], dc_q)
    for i in range(1, 16):
        q[i] = rnd(coeffs[i], ac_q)
    return np.clip(q, -2047, 2047)


def _dequant(q: np.ndarray, dc_q: int, ac_q: int) -> list:
    out = [0] * 16
    out[0] = int(q[0]) * dc_q
    for i in range(1, 16):
        out[i] = int(q[i]) * ac_q
    return out


def encode_vp8(img: np.ndarray, quality: float = 85.0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a VP8 key frame (raw payload)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    if not (0 < w < 16384 and 0 < h < 16384):
        raise ValueError("VP8 dimensions out of range")
    qi = _clamp_q(int(round((100.0 - quality) * 1.27)))
    y_dc, y_ac = int(DC_QLOOKUP[qi]), int(AC_QLOOKUP[qi])
    y2_dc, y2_ac = y_dc * 2, max(8, y_ac * 155 // 100)
    uv_dc = int(DC_QLOOKUP[_clamp_q(qi, 117)])
    uv_ac = y_ac

    ysrc, usrc, vsrc = rgb_to_yuv420(img)
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    # pad planes to the MB grid by edge replication, with borders like
    # the decoder's (row 0 = 127, col 0 = 129)
    yp = np.empty((mb_h * 16 + 1, mb_w * 16 + 1), dtype=np.uint8)
    up = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    vp = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    for plane, src in ((yp, ysrc), (up, usrc), (vp, vsrc)):
        plane[0, :] = 127
        plane[1:, 0] = 129
        sh, sw = src.shape
        plane[1:sh + 1, 1:sw + 1] = src
        plane[1:sh + 1, sw + 1:] = src[:, -1:]
        plane[sh + 1:, 1:] = plane[sh:sh + 1, 1:]
    rec_y, rec_u, rec_v = yp.copy(), up.copy(), vp.copy()

    head = _BoolEnc()
    head.put(128, 0)            # color space
    head.put(128, 0)            # clamping
    head.put(128, 0)            # segmentation off
    head.put(128, 0)            # filter type normal
    head.literal(0, 6)          # filter level 0
    head.literal(0, 3)          # sharpness
    head.put(128, 0)            # no lf deltas
    head.literal(0, 2)          # one token partition
    head.literal(qi, 7)         # y_ac_qi
    for _ in range(5):
        head.put(128, 0)        # quant deltas absent
    head.put(128, 1)            # refresh entropy probs
    up_probs = COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    head.put(int(up_probs[i, j, k, t]), 0)
    head.put(128, 0)            # mb_no_coeff_skip off

    tok = _BoolEnc()
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int8)

    for mb_y in range(mb_h):
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        for mb_x in range(mb_w):
            _tree_write(head, _YMODE_PATHS, KF_YMODE_PROB, DC_PRED)
            _tree_write(head, _UV_PATHS, KF_UV_MODE_PROB, DC_PRED)

            r0, c0 = mb_y * 16 + 1, mb_x * 16 + 1
            pred = _pred_16_or_8(rec_y, r0, c0, 16, DC_PRED,
                                 mb_y > 0, mb_x > 0)
            resid = yp[r0:r0 + 16, c0:c0 + 16].astype(np.int64) - pred
            qy = []
            dcs = np.empty((4, 4), dtype=np.int64)
            for i in range(16):
                r4, c4 = i >> 2, i & 3
                c = _fdct4x4(resid[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4])
                dcs[r4, c4] = c[0, 0]
                q = _quant_block(c.ravel(), y_dc, y_ac)
                q[0] = 0
                qy.append(q)
            qy2 = _quant_block(_fwht4x4(dcs).ravel(), y2_dc, y2_ac)

            ctx = int(above_nz_y2[mb_x]) + left_nz_y2
            nz2 = _write_coeffs(tok, 1, ctx, 0, qy2)
            above_nz_y2[mb_x] = left_nz_y2 = int(nz2)
            y2_out = _iwht4x4(_dequant(qy2, y2_dc, y2_ac))
            out = pred.copy()
            for i in range(16):
                r4, c4 = i >> 2, i & 3
                ctx = int(above_nz_y[mb_x, c4]) + left_nz_y[r4]
                nz = _write_coeffs(tok, 0, ctx, 1, qy[i])
                above_nz_y[mb_x, c4] = left_nz_y[r4] = int(nz)
                dq = _dequant(qy[i], y_dc, y_ac)
                dq[0] = y2_out[r4 * 4 + c4]
                out[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4] += _idct4x4(dq)
            rec_y[r0:r0 + 16, c0:c0 + 16] = np.clip(out, 0, 255)

            ru, cu = mb_y * 8 + 1, mb_x * 8 + 1
            for plane, rec, a_nz, l_nz in (
                    (up, rec_u, above_nz_u, left_nz_u),
                    (vp, rec_v, above_nz_v, left_nz_v)):
                predc = _pred_16_or_8(rec, ru, cu, 8, DC_PRED,
                                      mb_y > 0, mb_x > 0)
                residc = plane[ru:ru + 8, cu:cu + 8].astype(np.int64) \
                    - predc
                outc = predc.copy()
                for i in range(4):
                    r4, c4 = i >> 1, i & 1
                    c = _fdct4x4(
                        residc[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4])
                    q = _quant_block(c.ravel(), uv_dc, uv_ac)
                    ctx = int(a_nz[mb_x, c4]) + l_nz[r4]
                    nz = _write_coeffs(tok, 2, ctx, 0, q)
                    a_nz[mb_x, c4] = l_nz[r4] = int(nz)
                    outc[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4] += \
                        _idct4x4(_dequant(q, uv_dc, uv_ac))
                rec[ru:ru + 8, cu:cu + 8] = np.clip(outc, 0, 255)

    part1 = head.finish()
    part2 = tok.finish()
    tag = (len(part1) << 5) | (1 << 4) | 0   # key frame, show, version 0
    return (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            + b"\x9d\x01\x2a"
            + (w & 0x3FFF).to_bytes(2, "little")
            + (h & 0x3FFF).to_bytes(2, "little")
            + part1 + part2)


def encode_webp_lossy(img: np.ndarray, quality: float = 85.0) -> bytes:
    """Encode RGB as a lossy WebP (RIFF/WEBP/'VP8 ' container)."""
    payload = encode_vp8(img, quality)
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
