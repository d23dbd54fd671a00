"""Full VP8L decoder conformance: byte-identical vs libwebp lossless.

Every case encodes a deterministic image with the system libwebp
lossless encoder and asserts the pure-Python decoder reproduces the
input **byte-for-byte** (lossless admits no tolerance).  The fixture
matrix is chosen to force every bitstream feature: predictor + color
transforms (photo), subtract-green, color-indexing with pixel bundling
(2/12/200-color palettes), color cache and LZ77 (repetitive rows),
meta prefix groups (large photos), and odd non-tile-aligned sizes.
"""
from __future__ import annotations

import ctypes

import numpy as np
import pytest

from tests import libwebp_ref as R

pytestmark = pytest.mark.skipif(
    not R.HAVE_LIBWEBP, reason="system libwebp not available")


def _enc_lossless(img: np.ndarray) -> bytes:
    R.lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = R.lib.WebPEncodeLosslessRGB(img.tobytes(), w, h, w * 3,
                                    ctypes.byref(out))
    assert n
    data = ctypes.string_at(out, n)
    R.lib.WebPFree(out)
    return data


def _img(kind: str, w: int, h: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    xx = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    yy = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    if kind == "grad":
        return np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.uint8)
    if kind == "photo":
        base = np.zeros((h, w, 3))
        for k in range(1, 5):
            for c in range(3):
                base[..., c] += rng.uniform(10, 50) * np.sin(
                    2 * np.pi * k * xx / w + rng.uniform(0, 6)) * np.cos(
                    2 * np.pi * k * yy / h + rng.uniform(0, 6))
        return np.clip(base + 128 + rng.normal(0, 3, (h, w, 3)),
                       0, 255).astype(np.uint8)
    if kind.startswith("pal"):
        ncol = int(kind[3:])
        cols = rng.integers(0, 256, (ncol, 3))
        return cols[rng.integers(0, ncol, (h, w))].astype(np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "text":
        row = np.tile(rng.integers(0, 256, (1, 16, 3)),
                      (1, (w + 15) // 16, 1))[:, :w]
        return np.tile(row, (h, 1, 1)).astype(np.uint8)
    raise ValueError(kind)


MATRIX = [
    ("grad", 32, 24), ("photo", 64, 48), ("pal2", 40, 30),
    ("pal12", 48, 32), ("pal200", 50, 40), ("noise", 32, 32),
    ("text", 80, 60), ("photo", 160, 120), ("photo", 200, 160),
    ("pal2", 17, 13), ("pal12", 15, 9), ("grad", 300, 200),
    ("photo", 63, 47), ("noise", 8, 8), ("text", 256, 64),
]


@pytest.mark.parametrize("kind,w,h", MATRIX)
def test_lossless_byte_identical(kind, w, h):
    from sdk_spark.functions.webp import decode_webp

    img = _img(kind, w, h)
    out = decode_webp(_enc_lossless(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_lossless_rgba_with_alpha():
    from sdk_spark.functions.vp8l import decode_vp8l

    R.lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    rng = np.random.default_rng(9)
    h, w = 90, 130
    img = np.clip(rng.normal(128, 50, (h, w, 4)), 0, 255).astype(np.uint8)
    # alpha floor 1: with the default exact=0, libwebp's *encoder*
    # discards RGB under fully-transparent pixels
    img[..., 3] = np.maximum(img[..., 3], 1)
    out4 = ctypes.POINTER(ctypes.c_uint8)()
    n = R.lib.WebPEncodeLosslessRGBA(img.tobytes(), w, h, w * 4,
                                     ctypes.byref(out4))
    data = ctypes.string_at(out4, n)
    R.lib.WebPFree(out4)
    dec = decode_vp8l(R.vp8_chunk(data) if False else _vp8l_chunk(data),
                      return_alpha=True)
    assert (dec == img).all()


def _vp8l_chunk(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        t = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        if t == b"VP8L":
            return data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("no VP8L chunk")


@pytest.mark.parametrize("overrides", [
    {"lossless": 1, "method": 6},
    {"lossless": 1, "method": 0},
    {"lossless": 1, "exact": 1, "method": 4},
    {"lossless": 1, "near_lossless": 60},
])
def test_encoder_effort_variants(overrides):
    """Different libwebp effort settings exercise different feature
    combinations; near-lossless alters pixels pre-encode, so compare
    against libwebp's own decode."""
    R.lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    from sdk_spark.functions.webp import decode_webp

    img = _img("photo", 110, 90)
    data = R.encode_rgb_advanced(img, 75, **overrides)
    w2 = ctypes.c_int()
    h2 = ctypes.c_int()
    p = R.lib.WebPDecodeRGB(data, ctypes.c_size_t(len(data)),
                            ctypes.byref(w2), ctypes.byref(h2))
    ref = np.ctypeslib.as_array(p, shape=(h2.value, w2.value, 3)).copy()
    R.lib.WebPFree(p)
    assert (decode_webp(data) == ref).all()


def test_engine_literal_encoder_still_roundtrips():
    """The engine's own literal-only VP8L encoder feeds the full
    decoder."""
    from sdk_spark.functions.webp import decode_webp, encode_webp

    img = _img("noise", 21, 17)
    assert (decode_webp(encode_webp(img)) == img).all()


def test_alpha_filters_all_modes():
    """Alpha planes across filter modes (none/horizontal/vertical/
    gradient picked by content) decode bit-exactly."""
    R.lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    R.lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    from sdk_spark.functions.webp import decode_webp

    rng = np.random.default_rng(4)
    h, w = 60, 80
    xx = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    yy = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    alphas = [rng.integers(0, 256, (h, w)),          # raw (incompressible)
              np.where((xx + yy) % 50 < 25, 255, 0),  # binary
              xx, yy,                                  # h/v gradients
              np.clip(128 + 90 * np.sin(xx / 15) * np.cos(yy / 11),
                      0, 255)]
    for a in alphas:
        img = np.zeros((h, w, 4), np.uint8)
        img[..., 0] = xx
        img[..., 1] = yy
        img[..., 2] = (xx + yy) / 2
        img[..., 3] = a
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = R.lib.WebPEncodeRGBA(img.tobytes(), w, h, w * 4,
                                 ctypes.c_float(80.0), ctypes.byref(out))
        data = ctypes.string_at(out, n)
        R.lib.WebPFree(out)
        w2 = ctypes.c_int()
        h2 = ctypes.c_int()
        p = R.lib.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                                 ctypes.byref(w2), ctypes.byref(h2))
        ref = np.ctypeslib.as_array(p, shape=(h2.value, w2.value, 4)).copy()
        R.lib.WebPFree(p)
        mine = decode_webp(data, return_alpha=True)
        assert (mine[..., 3] == ref[..., 3]).all()
