"""Lossy WebP (VP8 key-frame) decoder in pure Python/numpy — RFC 6386.

Still-image WebP lossy data is a single VP8 *key frame* (intra-only).
This module implements the full key-frame feature set: the boolean
arithmetic coder, segmentation (per-segment quantizer and filter level),
multiple token partitions, coefficient-probability updates, all intra
prediction modes (16x16 DC/V/H/TM, chroma, and the ten 4x4 B_PRED
modes), iWHT/iDCT reconstruction, and the in-loop deblocking filter
(normal and simple).  Interframe features (reference frames, motion
vectors) cannot occur in still WebP and are rejected.

Constant tables (token probabilities, kf b-mode probabilities, dequant
lookups, scan order) are the RFC 6386 spec tables, generated into
``vp8_tables.py`` by ``tools/extract_vp8_tables.py``.

Conformance: tests/test_vp8.py decodes libwebp-encoded fixtures and
asserts the reconstructed Y/U/V planes are **bit-exact** versus
``WebPDecodeYUV`` (including the loop filter), so every table byte and
filter branch is externally validated, not just round-trip-consistent.

Reference parity note: the json-structure reference SDK contains no
image codecs; this module exists for the engine's multimodal tier
(north-rule PSNR>=40dB decoded-pixel invariant on lossy formats).
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

from .vp8_tables import (AC_QLOOKUP, COEFF_BANDS, COEFF_PROBS,
                         COEFF_UPDATE_PROBS, DC_QLOOKUP, KF_BMODE_PROBS,
                         ZIGZAG)

# ---------------------------------------------------------------------------
# boolean arithmetic decoder (RFC 6386 section 7)
# ---------------------------------------------------------------------------


class _Bool:
    __slots__ = ("buf", "pos", "end", "value", "range", "bits")

    def __init__(self, buf: bytes, start: int, end: int):
        self.buf, self.pos, self.end = buf, start, end
        v = 0
        for _ in range(2):
            v = (v << 8) | self._next()
        self.value, self.range, self.bits = v, 255, 0

    def _next(self) -> int:
        b = self.buf[self.pos] if self.pos < self.end else 0
        self.pos += 1
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        r, v, bits = self.range, self.value, self.bits
        while r < 128:
            v <<= 1
            r <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                v |= self._next()
        self.range, self.value, self.bits = r, v, bits
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i

    def tree_from(self, tree: tuple, probs, start: int) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# trees and small probability tables (RFC 6386 sections 8.2, 11, 13)
# ---------------------------------------------------------------------------

# intra 16x16 modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

# intra 4x4 sub-modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = (-B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
              -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
# 16x16 mode implied sub-mode for neighbor context
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# DCT coefficient tokens
COEFF_TREE = (-11, 2,      # dct_eob
              -0, 4,       # DCT_0
              -1, 6,       # DCT_1
              8, 12,
              -2, 10,      # DCT_2
              -3, -4,      # DCT_3, DCT_4
              14, 16,
              -5, -6,      # cat1, cat2
              18, 20,
              -7, -8,      # cat3, cat4
              -9, -10)     # cat5, cat6
CAT_PROBS = ((159,),
             (165, 145),
             (173, 148, 140),
             (176, 155, 140, 135),
             (180, 157, 141, 134, 130),
             (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
CAT_BASE = (5, 7, 11, 19, 35, 67)

_BANDS = tuple(int(b) for b in COEFF_BANDS)
_ZIGZAG = tuple(int(z) for z in ZIGZAG)


def _clamp_q(q: int, hi: int = 127) -> int:
    return 0 if q < 0 else hi if q > hi else q


class _Segment:
    __slots__ = ("quant", "lf")

    def __init__(self):
        self.quant = 0
        self.lf = 0


class _Header:
    """Parsed key-frame header state."""


def parse_header(data: bytes) -> _Header:
    """Parse the VP8 frame tag + key-frame first-partition header.

    ``data`` is the raw VP8 chunk payload (no RIFF container).
    """
    h = _Header()
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    h.key_frame = (tag & 1) == 0
    h.version = (tag >> 1) & 7
    h.show_frame = (tag >> 4) & 1
    h.first_part_size = tag >> 5
    if not h.key_frame:
        raise NotImplementedError(
            "VP8 interframe: still-image WebP is always a key frame")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    wcode = data[6] | (data[7] << 8)
    hcode = data[8] | (data[9] << 8)
    h.width, h.height = wcode & 0x3FFF, hcode & 0x3FFF
    if not h.width or not h.height:
        raise ValueError("zero VP8 dimensions")
    h.mb_w = (h.width + 15) >> 4
    h.mb_h = (h.height + 15) >> 4

    b = _Bool(data, 10, 10 + h.first_part_size)
    h.color_space = b.get(128)
    h.clamping = b.get(128)

    # -- segmentation (section 9.3)
    h.seg_enabled = b.get(128)
    h.update_map = 0
    h.seg_abs = 0
    h.segments = [_Segment() for _ in range(4)]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.update_map = b.get(128)
        update_data = b.get(128)
        if update_data:
            h.seg_abs = b.get(128)
            for s in h.segments:
                s.quant = b.signed(7) if b.get(128) else 0
            for s in h.segments:
                s.lf = b.signed(6) if b.get(128) else 0
        if h.update_map:
            h.seg_tree_probs = [b.literal(8) if b.get(128) else 255
                                for _ in range(3)]

    # -- loop filter (section 9.4)
    h.filter_simple = b.get(128)
    h.filter_level = b.literal(6)
    h.sharpness = b.literal(3)
    h.lf_delta_enabled = b.get(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if b.get(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if b.get(128):
                    h.ref_lf_deltas[i] = b.signed(6)
            for i in range(4):
                if b.get(128):
                    h.mode_lf_deltas[i] = b.signed(6)

    # -- token partitions (section 9.5)
    h.num_parts = 1 << b.literal(2)

    # -- quantizer indices (section 9.6)
    h.y_ac_qi = b.literal(7)
    h.y_dc_delta = b.signed(4) if b.get(128) else 0
    h.y2_dc_delta = b.signed(4) if b.get(128) else 0
    h.y2_ac_delta = b.signed(4) if b.get(128) else 0
    h.uv_dc_delta = b.signed(4) if b.get(128) else 0
    h.uv_ac_delta = b.signed(4) if b.get(128) else 0

    h.refresh_entropy = b.get(128)

    # -- token probability updates (section 13.4)
    probs = COEFF_PROBS.copy()
    up = COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    if b.get(int(up[i, j, k, t])):
                        probs[i, j, k, t] = b.literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = b.get(128)
    h.prob_skip_false = b.literal(8) if h.mb_no_skip else 0

    h.bool = b  # continues with per-MB mode records
    return h


def _dequant_factors(h: _Header, seg: int):
    """Per-segment dequant factors (RFC 6386 section 14.1)."""
    if h.seg_enabled:
        base = (h.segments[seg].quant if h.seg_abs
                else h.y_ac_qi + h.segments[seg].quant)
    else:
        base = h.y_ac_qi
    q = _clamp_q(base)
    y1_dc = int(DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)])
    y1_ac = int(AC_QLOOKUP[q])
    y2_dc = int(DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)]) * 2
    y2_ac = int(AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)]) * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = int(DC_QLOOKUP[_clamp_q(q + h.uv_dc_delta, 117)])
    uv_ac = int(AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)])
    return (y1_dc, y1_ac), (y2_dc, y2_ac), (uv_dc, uv_ac)


# ---------------------------------------------------------------------------
# coefficient token decoding (RFC 6386 section 13)
# ---------------------------------------------------------------------------

def _decode_coeffs(b: _Bool, probs, block_type: int, ctx: int,
                   first: int, dqf) -> tuple:
    """Decode one 4x4 block's tokens; return (coeffs[16] int list, nz)."""
    coeffs = [0] * 16
    tp = probs[block_type]
    n = first
    nz = False
    prev_zero = False
    dc_q, ac_q = dqf
    while n < 16:
        p = tp[_BANDS[n]][ctx]
        if prev_zero:
            t = b.tree_from(COEFF_TREE, p, 2)
        else:
            t = b.tree(COEFF_TREE, p)
        if t == 11:          # EOB
            break
        if t == 0:           # DCT_0
            ctx = 0
            prev_zero = True
            n += 1
            continue
        prev_zero = False
        if t <= 4:
            v = t
            ctx = 1 if v == 1 else 2
        else:                # category token: extra bits
            cat = t - 5
            v = 0
            for cp in CAT_PROBS[cat]:
                v = (v << 1) | b.get(cp)
            v += CAT_BASE[cat]
            ctx = 2
        if b.get(128):
            v = -v
        coeffs[_ZIGZAG[n]] = v * (dc_q if n == 0 else ac_q)
        nz = True
        n += 1
    return coeffs, nz


# ---------------------------------------------------------------------------
# inverse transforms (RFC 6386 section 14.3/14.4)
# ---------------------------------------------------------------------------

_C1 = 20091   # sqrt(2)*cos(pi/8) - 1, Q16
_C2 = 35468   # sqrt(2)*sin(pi/8), Q16


def _idct4x4(c: list) -> np.ndarray:
    """VP8 inverse DCT on a 16-coeff (raster order) block -> (4,4) int."""
    t = [0] * 16
    for i in range(4):
        c0, c4, c8, c12 = c[i], c[i + 4], c[i + 8], c[i + 12]
        a1 = c0 + c8
        b1 = c0 - c8
        t1 = (c4 * _C2) >> 16
        t2 = c12 + ((c12 * _C1) >> 16)
        c1_ = t1 - t2
        t1 = c4 + ((c4 * _C1) >> 16)
        t2 = (c12 * _C2) >> 16
        d1 = t1 + t2
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1_
        t[i + 8] = b1 - c1_
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = i * 4
        c0, c4, c8, c12 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = c0 + c8
        b1 = c0 - c8
        t1 = (c4 * _C2) >> 16
        t2 = c12 + ((c12 * _C1) >> 16)
        c1_ = t1 - t2
        t1 = c4 + ((c4 * _C1) >> 16)
        t2 = (c12 * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1_ + 4) >> 3
        out[i, 2] = (b1 - c1_ + 4) >> 3
    return out


def _iwht4x4(c: list) -> list:
    """VP8 inverse Walsh-Hadamard for the Y2 block -> 16 DC values."""
    t = [0] * 16
    for i in range(4):
        a1 = c[i] + c[i + 12]
        b1 = c[i + 4] + c[i + 8]
        c1 = c[i + 4] - c[i + 8]
        d1 = c[i] - c[i + 12]
        t[i] = a1 + b1
        t[i + 4] = c1 + d1
        t[i + 8] = a1 - b1
        t[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 section 12)
# ---------------------------------------------------------------------------

def _pred_16_or_8(plane: np.ndarray, r: int, c: int, n: int, mode: int,
                  have_above: bool, have_left: bool) -> np.ndarray:
    """Whole-block (16x16 Y or 8x8 chroma) prediction into an int array.

    ``plane`` is the bordered plane; (r, c) is the top-left of the block
    in bordered coordinates (so row r-1 / col c-1 are the borders).
    """
    above = plane[r - 1, c:c + n].astype(np.int32)
    left = plane[r:r + n, c - 1].astype(np.int32)
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + n) >> \
                (5 if n == 16 else 4)
        elif have_above:
            dc = (int(above.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        else:
            dc = 128
        return np.full((n, n), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.repeat(above[None, :], n, axis=0)
    if mode == H_PRED:
        return np.repeat(left[:, None], n, axis=1)
    # TM_PRED
    tl = int(plane[r - 1, c - 1])
    return np.clip(left[:, None] + above[None, :] - tl, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode: int, A: np.ndarray, L: np.ndarray, tl: int) -> np.ndarray:
    """4x4 sub-block prediction. A = 8 above pixels (A[0..3] above,
    A[4..7] above-right), L = 4 left pixels, tl = above-left."""
    A = A.astype(np.int32)
    L = L.astype(np.int32)
    p = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        p[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        p[:] = np.clip(L[:, None] + A[None, :4] - tl, 0, 255)
    elif mode == B_VE:
        e = np.array([tl, A[0], A[1], A[2], A[3], A[4]], dtype=np.int32)
        row = _avg3(e[:4], e[1:5], e[2:6])
        p[:] = row[None, :]
    elif mode == B_HE:
        e = np.array([tl, L[0], L[1], L[2], L[3], L[3]], dtype=np.int32)
        col = _avg3(e[:4], e[1:5], e[2:6])
        p[:] = col[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r, c] = (_avg3(A[i], A[i + 1], A[i + 2]) if i < 6
                           else _avg3(A[6], A[7], A[7]))
    elif mode == B_RD:
        e = np.array([L[3], L[2], L[1], L[0], tl,
                      A[0], A[1], A[2], A[3]], dtype=np.int32)
        for r in range(4):
            for c in range(4):
                i = c - r + 3   # index into e of the pixel "above-left" run
                p[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        e = np.array([L[3], L[2], L[1], L[0], tl,
                      A[0], A[1], A[2], A[3]], dtype=np.int32)
        p[3, 0] = _avg3(e[1], e[2], e[3])
        p[2, 0] = _avg3(e[2], e[3], e[4])
        p[3, 1] = p[1, 0] = _avg3(e[3], e[4], e[5])
        p[2, 1] = p[0, 0] = _avg2(e[4], e[5])
        p[3, 2] = p[1, 1] = _avg3(e[4], e[5], e[6])
        p[2, 2] = p[0, 1] = _avg2(e[5], e[6])
        p[3, 3] = p[1, 2] = _avg3(e[5], e[6], e[7])
        p[2, 3] = p[0, 2] = _avg2(e[6], e[7])
        p[1, 3] = _avg3(e[6], e[7], e[8])
        p[0, 3] = _avg2(e[7], e[8])
    elif mode == B_VL:
        p[0, 0] = _avg2(A[0], A[1])
        p[1, 0] = _avg3(A[0], A[1], A[2])
        p[2, 0] = p[0, 1] = _avg2(A[1], A[2])
        p[1, 1] = p[3, 0] = _avg3(A[1], A[2], A[3])
        p[2, 1] = p[0, 2] = _avg2(A[2], A[3])
        p[3, 1] = p[1, 2] = _avg3(A[2], A[3], A[4])
        p[2, 2] = p[0, 3] = _avg2(A[3], A[4])
        p[3, 2] = p[1, 3] = _avg3(A[3], A[4], A[5])
        p[2, 3] = _avg3(A[4], A[5], A[6])
        p[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        e = np.array([L[3], L[2], L[1], L[0], tl,
                      A[0], A[1], A[2]], dtype=np.int32)
        p[3, 0] = _avg2(e[0], e[1])
        p[3, 1] = _avg3(e[0], e[1], e[2])
        p[2, 0] = p[3, 2] = _avg2(e[1], e[2])
        p[2, 1] = p[3, 3] = _avg3(e[1], e[2], e[3])
        p[2, 2] = p[1, 0] = _avg2(e[2], e[3])
        p[2, 3] = p[1, 1] = _avg3(e[2], e[3], e[4])
        p[1, 2] = p[0, 0] = _avg2(e[3], e[4])
        p[1, 3] = p[0, 1] = _avg3(e[3], e[4], e[5])
        p[0, 2] = _avg3(e[4], e[5], e[6])
        p[0, 3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HU:
        p[0, 0] = _avg2(L[0], L[1])
        p[0, 1] = _avg3(L[0], L[1], L[2])
        p[0, 2] = p[1, 0] = _avg2(L[1], L[2])
        p[0, 3] = p[1, 1] = _avg3(L[1], L[2], L[3])
        p[1, 2] = p[2, 0] = _avg2(L[2], L[3])
        p[1, 3] = p[2, 1] = _avg3(L[2], L[3], L[3])
        p[2, 2] = p[2, 3] = p[3, 0] = p[3, 1] = p[3, 2] = p[3, 3] = L[3]
    else:
        raise ValueError(f"bad b-mode {mode}")
    return p


# ---------------------------------------------------------------------------
# frame decode (RFC 6386 sections 8, 12-14)
# ---------------------------------------------------------------------------

class _MBInfo:
    __slots__ = ("seg", "skip", "ymode", "uvmode", "bmodes", "has_coeffs",
                 "level", "inner")


def decode_frame(data: bytes):
    """Decode a VP8 key-frame payload to (header, y, u, v) uint8 planes.

    Planes cover the padded macroblock grid (mb_h*16, mb_w*16); callers
    crop to (height, width).
    """
    h = parse_header(data)
    mb_w, mb_h = h.mb_w, h.mb_h
    b = h.bool

    # token partitions: sizes trail the first partition
    part_base = 10 + h.first_part_size
    sizes_len = 3 * (h.num_parts - 1)
    offs = []
    p = part_base + sizes_len
    for i in range(h.num_parts - 1):
        s = part_base + 3 * i
        ln = data[s] | (data[s + 1] << 8) | (data[s + 2] << 16)
        offs.append((p, p + ln))
        p += ln
    offs.append((p, len(data)))
    parts = [_Bool(data, s, e) for s, e in offs]

    # bordered planes: row 0 = above border (127), col 0 = left border
    # (129); Y gets +4 cols for the above-right of rightmost MBs
    y = np.empty((mb_h * 16 + 1, mb_w * 16 + 5), dtype=np.uint8)
    u = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    v = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    for pl in (y, u, v):
        pl[0, :] = 127
        pl[1:, 0] = 129
    y[0, :] = 127  # includes the 4-px right extension on the border row

    # nonzero-coefficient contexts (section 13.4)
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int8)
    # b-mode context rows (B_DC for borders)
    above_bmodes = [[B_DC] * 4 for _ in range(mb_w)]

    seg_dqf = [_dequant_factors(h, s) for s in range(4)]
    probs = [[[list(h.coeff_probs[i, j, k]) for k in range(3)]
              for j in range(8)] for i in range(4)]

    mbs = []
    for mb_y in range(mb_h):
        left_nz_y = [0, 0, 0, 0]
        left_nz_u = [0, 0]
        left_nz_v = [0, 0]
        left_nz_y2 = 0
        left_bmodes = [B_DC] * 4
        tok = parts[mb_y % h.num_parts]
        for mb_x in range(mb_w):
            mi = _MBInfo()
            # ---- mode record (first partition)
            mi.seg = (b.tree(MB_SEGMENT_TREE, h.seg_tree_probs)
                      if (h.seg_enabled and h.update_map) else 0)
            mi.skip = b.get(h.prob_skip_false) if h.mb_no_skip else 0
            mi.ymode = b.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if mi.ymode == B_PRED:
                bm = [0] * 16
                ab = above_bmodes[mb_x]
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    a = bm[i - 4] if r4 else ab[c4]
                    lft = bm[i - 1] if c4 else left_bmodes[r4]
                    bm[i] = b.tree(BMODE_TREE, KF_BMODE_PROBS[a][lft])
                mi.bmodes = bm
                above_bmodes[mb_x] = bm[12:16]
                left_bmodes = [bm[3], bm[7], bm[11], bm[15]]
            else:
                mi.bmodes = None
                mbm = MODE_TO_BMODE[mi.ymode]
                above_bmodes[mb_x] = [mbm] * 4
                left_bmodes = [mbm] * 4
            mi.uvmode = b.tree(UV_MODE_TREE, KF_UV_MODE_PROB)

            # ---- coefficients (token partition)
            dqf_y1, dqf_y2, dqf_uv = seg_dqf[mi.seg]
            has_y2 = mi.ymode != B_PRED
            blocks_y = [None] * 16
            blocks_u = [None] * 4
            blocks_v = [None] * 4
            y2_out = None
            mi.has_coeffs = False
            if mi.skip:
                left_nz_y[:] = [0, 0, 0, 0]
                above_nz_y[mb_x, :] = 0
                left_nz_u[:] = [0, 0]
                left_nz_v[:] = [0, 0]
                above_nz_u[mb_x, :] = 0
                above_nz_v[mb_x, :] = 0
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mb_x] = 0
            else:
                if has_y2:
                    ctx = int(above_nz_y2[mb_x]) + left_nz_y2
                    c2, nz2 = _decode_coeffs(tok, probs, 1, ctx, 0, dqf_y2)
                    above_nz_y2[mb_x] = left_nz_y2 = int(nz2)
                    y2_out = _iwht4x4(c2)
                    if nz2:
                        mi.has_coeffs = True
                    btype, first = 0, 1
                else:
                    btype, first = 3, 0
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    ctx = int(above_nz_y[mb_x, c4]) + left_nz_y[r4]
                    c16, nz = _decode_coeffs(tok, probs, btype, ctx,
                                             first, dqf_y1)
                    if has_y2:
                        c16[0] = y2_out[r4 * 4 + c4]
                    above_nz_y[mb_x, c4] = left_nz_y[r4] = int(nz)
                    if nz:
                        mi.has_coeffs = True
                    blocks_y[i] = c16
                for pl, (blocks, a_nz, l_nz) in enumerate(
                        ((blocks_u, above_nz_u, left_nz_u),
                         (blocks_v, above_nz_v, left_nz_v))):
                    for i in range(4):
                        r4, c4 = i >> 1, i & 1
                        ctx = int(a_nz[mb_x, c4]) + l_nz[r4]
                        cuv, nz = _decode_coeffs(tok, probs, 2, ctx,
                                                 0, dqf_uv)
                        a_nz[mb_x, c4] = l_nz[r4] = int(nz)
                        if nz:
                            mi.has_coeffs = True
                        blocks[i] = cuv

            # ---- reconstruction
            r0, c0 = mb_y * 16 + 1, mb_x * 16 + 1
            have_above, have_left = mb_y > 0, mb_x > 0
            if mi.ymode == B_PRED:
                # above-right of the MB, reused by right-column subblocks
                if mb_x == mb_w - 1:
                    ar_mb = np.full(4, 127 if mb_y == 0
                                    else int(y[r0 - 1, c0 + 15]),
                                    dtype=np.uint8)
                else:
                    ar_mb = y[r0 - 1, c0 + 16:c0 + 20].copy()
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    rr, cc = r0 + r4 * 4, c0 + c4 * 4
                    if c4 == 3:
                        arr_ = ar_mb
                    else:
                        arr_ = y[rr - 1, cc + 4:cc + 8]
                    A = np.concatenate([y[rr - 1, cc:cc + 4], arr_])
                    L = y[rr:rr + 4, cc - 1]
                    tl = int(y[rr - 1, cc - 1])
                    pred = _pred_b(mi.bmodes[i], A, L, tl)
                    if blocks_y[i] is not None:
                        pred = pred + _idct4x4(blocks_y[i])
                    y[rr:rr + 4, cc:cc + 4] = np.clip(pred, 0, 255)
            else:
                pred = _pred_16_or_8(y, r0, c0, 16, mi.ymode,
                                     have_above, have_left)
                out = pred.copy()
                if not mi.skip:
                    for i in range(16):
                        r4, c4 = i >> 2, i & 3
                        out[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4] += \
                            _idct4x4(blocks_y[i])
                y[r0:r0 + 16, c0:c0 + 16] = np.clip(out, 0, 255)
            ru, cu = mb_y * 8 + 1, mb_x * 8 + 1
            for pl, blocks in ((u, blocks_u), (v, blocks_v)):
                pred = _pred_16_or_8(pl, ru, cu, 8, mi.uvmode,
                                     have_above, have_left)
                out = pred.copy()
                if not mi.skip:
                    for i in range(4):
                        r4, c4 = i >> 1, i & 1
                        out[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4] += \
                            _idct4x4(blocks[i])
                pl[ru:ru + 8, cu:cu + 8] = np.clip(out, 0, 255)

            # right extension of the above-border row for the next MB row
            if mb_x == mb_w - 1:
                y[r0 + 15, c0 + 16:c0 + 20] = y[r0 + 15, c0 + 15]

            # ---- loop filter level (section 15.2)
            lvl = (h.segments[mi.seg].lf if h.seg_abs
                   else h.filter_level + h.segments[mi.seg].lf) \
                if h.seg_enabled else h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_deltas[0]          # always INTRA frame
                if mi.ymode == B_PRED:
                    lvl += h.mode_lf_deltas[0]
            mi.level = max(0, min(63, lvl))
            mi.inner = mi.has_coeffs or mi.ymode == B_PRED
            mbs.append(mi)

    if h.filter_level:
        _loop_filter(h, mbs, y, u, v)
    return h, y[1:, 1:mb_w * 16 + 1], u[1:, 1:], v[1:, 1:]


# ---------------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 section 15)
# ---------------------------------------------------------------------------

def _s(x):
    """u8 -> signed domain (value - 128) as int32 array."""
    return x.astype(np.int32) - 128


def _u(x):
    return (np.clip(x, -128, 127) + 128).astype(np.uint8)


def _c127(x):
    return np.clip(x, -128, 127)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """Returns (a, new_p0, new_q0); all args signed int32 arrays."""
    a = _c127((_c127(p1 - q1) if use_outer is True else
               np.where(use_outer, _c127(p1 - q1), 0)) + 3 * (q0 - p0))
    f1 = _c127(a + 4) >> 3
    f2 = _c127(a + 3) >> 3
    return f1, _c127(p0 + f2), _c127(q0 - f1)


def _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3):
    return ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= limit)
            & (np.abs(p3 - p2) <= ilimit) & (np.abs(p2 - p1) <= ilimit)
            & (np.abs(p1 - p0) <= ilimit) & (np.abs(q1 - q0) <= ilimit)
            & (np.abs(q2 - q1) <= ilimit) & (np.abs(q3 - q2) <= ilimit))


def _hev(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _normal_edge(px, mb_edge, limit, ilimit, thresh):
    """Filter one edge. px: (8, n) signed array rows p3..q3 (modified)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in range(8))
    mask = _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3)
    hev = _hev(thresh, p1, p0, q0, q1)
    if mb_edge:
        # hev pixels: common adjust with outer taps
        f1, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
        sel = mask & hev
        px[3] = np.where(sel, np0, p0)
        px[4] = np.where(sel, nq0, q0)
        # non-hev: 27/18/9 wide filter
        w = _c127(_c127(p1 - q1) + 3 * (q0 - p0))
        sel = mask & ~hev
        a = (27 * w + 63) >> 7
        px[3] = np.where(sel, _c127(p0 + a), px[3])
        px[4] = np.where(sel, _c127(q0 - a), px[4])
        a = (18 * w + 63) >> 7
        px[2] = np.where(sel, _c127(p1 + a), p1)
        px[5] = np.where(sel, _c127(q1 - a), q1)
        a = (9 * w + 63) >> 7
        px[1] = np.where(sel, _c127(p2 + a), p2)
        px[6] = np.where(sel, _c127(q2 - a), q2)
    else:
        f1, np0, nq0 = _common_adjust(hev, p1, p0, q0, q1)
        px[3] = np.where(mask, np0, p0)
        px[4] = np.where(mask, nq0, q0)
        a3 = (f1 + 1) >> 1
        sel = mask & ~hev
        px[2] = np.where(sel, _c127(p1 + a3), p1)
        px[5] = np.where(sel, _c127(q1 - a3), q1)


def _simple_edge(px, limit):
    """Simple filter on rows p1,p0,q0,q1 = px[0..3] (signed)."""
    p1, p0, q0, q1 = (px[i] for i in range(4))
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= limit
    _, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
    px[1] = np.where(mask, np0, p0)
    px[2] = np.where(mask, nq0, q0)


def _gather_v(plane, r, c, n, half):
    """Vertical edge at column c: rows r..r+n, cols c-half..c+half."""
    return _s(plane[r:r + n, c - half:c + half].T.copy())


def _scatter_v(plane, r, c, n, half, px):
    plane[r:r + n, c - half:c + half] = _u(px).T


def _gather_h(plane, r, c, n, half):
    return _s(plane[r - half:r + half, c:c + n].copy())


def _scatter_h(plane, r, c, n, half, px):
    plane[r - half:r + half, c:c + n] = _u(px)


def _loop_filter(h, mbs, y, u, v):
    mb_w, mb_h = h.mb_w, h.mb_h
    sharp = h.sharpness
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mi = mbs[mb_y * mb_w + mb_x]
            lvl = mi.level
            if lvl == 0:
                continue
            ilimit = lvl
            if sharp:
                ilimit >>= 2 if sharp > 4 else 1
                if ilimit > 9 - sharp:
                    ilimit = 9 - sharp
            if ilimit < 1:
                ilimit = 1
            edge_lim_mb = (lvl + 2) * 2 + ilimit
            edge_lim_sb = lvl * 2 + ilimit
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            r0, c0 = mb_y * 16 + 1, mb_x * 16 + 1
            ru, cu = mb_y * 8 + 1, mb_x * 8 + 1
            if h.filter_simple:
                if mb_x:
                    px = _gather_v(y, r0, c0, 16, 2)
                    _simple_edge(px, edge_lim_mb)
                    _scatter_v(y, r0, c0, 16, 2, px)
                if mi.inner:
                    for dx in (4, 8, 12):
                        px = _gather_v(y, r0, c0 + dx, 16, 2)
                        _simple_edge(px, edge_lim_sb)
                        _scatter_v(y, r0, c0 + dx, 16, 2, px)
                if mb_y:
                    px = _gather_h(y, r0, c0, 16, 2)
                    _simple_edge(px, edge_lim_mb)
                    _scatter_h(y, r0, c0, 16, 2, px)
                if mi.inner:
                    for dy in (4, 8, 12):
                        px = _gather_h(y, r0 + dy, c0, 16, 2)
                        _simple_edge(px, edge_lim_sb)
                        _scatter_h(y, r0 + dy, c0, 16, 2, px)
                continue
            # normal filter: all vertical edges, then all horizontal
            if mb_x:
                for pl, r_, c_, n in ((y, r0, c0, 16), (u, ru, cu, 8),
                                      (v, ru, cu, 8)):
                    px = _gather_v(pl, r_, c_, n, 4)
                    _normal_edge(px, True, edge_lim_mb, ilimit, hev_t)
                    _scatter_v(pl, r_, c_, n, 4, px)
            if mi.inner:
                for dx in (4, 8, 12):
                    px = _gather_v(y, r0, c0 + dx, 16, 4)
                    _normal_edge(px, False, edge_lim_sb, ilimit, hev_t)
                    _scatter_v(y, r0, c0 + dx, 16, 4, px)
                for pl in (u, v):
                    px = _gather_v(pl, ru, cu + 4, 8, 4)
                    _normal_edge(px, False, edge_lim_sb, ilimit, hev_t)
                    _scatter_v(pl, ru, cu + 4, 8, 4, px)
            if mb_y:
                for pl, r_, c_, n in ((y, r0, c0, 16), (u, ru, cu, 8),
                                      (v, ru, cu, 8)):
                    px = _gather_h(pl, r_, c_, n, 4)
                    _normal_edge(px, True, edge_lim_mb, ilimit, hev_t)
                    _scatter_h(pl, r_, c_, n, 4, px)
            if mi.inner:
                for dy in (4, 8, 12):
                    px = _gather_h(y, r0 + dy, c0, 16, 4)
                    _normal_edge(px, False, edge_lim_sb, ilimit, hev_t)
                    _scatter_h(y, r0 + dy, c0, 16, 4, px)
                for pl in (u, v):
                    px = _gather_h(pl, ru + 4, cu, 8, 4)
                    _normal_edge(px, False, edge_lim_sb, ilimit, hev_t)
                    _scatter_h(pl, ru + 4, cu, 8, 4, px)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def decode_vp8_yuv(payload: bytes):
    """Decode a raw VP8 key-frame payload to cropped (y, u, v) planes."""
    h, y, u, v = decode_frame(payload)
    cw, ch = h.width, h.height
    return (y[:ch, :cw], u[:(ch + 1) // 2, :(cw + 1) // 2],
            v[:(ch + 1) // 2, :(cw + 1) // 2])


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YUV420 -> (h, w, 3) uint8 RGB.

    Chroma is upsampled bilinearly (co-sited with even luma samples, the
    same siting libwebp's encoder downsamples with); exact upsampling
    taps only matter at sharp chroma edges and are inside the PSNR>=40
    invariant either way.
    """
    h, w = y.shape
    uf = _upsample2(u.astype(np.float64), h, w)
    vf = _upsample2(v.astype(np.float64), h, w)
    yf = y.astype(np.float64)
    c = 1.164 * (yf - 16.0)
    r = c + 1.596 * (vf - 128.0)
    g = c - 0.813 * (vf - 128.0) - 0.391 * (uf - 128.0)
    bl = c + 2.018 * (uf - 128.0)
    return np.clip(np.stack([r, g, bl], axis=-1).round(), 0,
                   255).astype(np.uint8)


def _upsample2(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """2x bilinear chroma upsample with edge replication."""
    ph, pw = p.shape
    big = np.empty((ph * 2, pw * 2), dtype=p.dtype)
    pad = np.pad(p, 1, mode="edge")
    a, b_, c, d = pad[:-1, :-1], pad[:-1, 1:], pad[1:, :-1], pad[1:, 1:]
    # each chroma sample expands to 2x2; bilinear between neighbors
    big[0::2, 0::2] = (9 * d[:-1, :-1] + 3 * (b_[:-1, :-1] + c[:-1, :-1])
                       + a[:-1, :-1]) / 16.0
    big[0::2, 1::2] = (9 * c[:-1, 1:] + 3 * (a[:-1, 1:] + d[:-1, 1:])
                       + b_[:-1, 1:]) / 16.0
    big[1::2, 0::2] = (9 * b_[1:, :-1] + 3 * (d[1:, :-1] + a[1:, :-1])
                       + c[1:, :-1]) / 16.0
    big[1::2, 1::2] = (9 * a[1:, 1:] + 3 * (c[1:, 1:] + b_[1:, 1:])
                       + d[1:, 1:]) / 16.0
    return big[:h, :w]


@malformed_input_guard('vp8')
def decode_vp8_rgb(payload: bytes) -> np.ndarray:
    """Decode a raw VP8 key-frame payload to (h, w, 3) uint8 RGB."""
    return yuv420_to_rgb(*decode_vp8_yuv(payload))
