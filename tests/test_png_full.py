"""Full-feature PNG decoder conformance.

External validation: fixtures produced by the system libgd (real libpng
writer — its own filter heuristics, palette depths 1/2/4/8, Adam7
interlacing, RGBA) must decode byte-identically.  Color types libgd
cannot emit (grayscale, gray+alpha, 16-bit, palette tRNS) are covered
by spec-assembled streams.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tests import libgd_ref as G

pytestmark = pytest.mark.skipif(
    not G.HAVE_LIBGD, reason="system libgd not available")


def _rng(seed=6):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("w,h,interlace", [
    (33, 21, False), (64, 48, True), (7, 5, False), (128, 1, True),
    (1, 77, False), (16, 16, True),
])
def test_truecolor(w, h, interlace):
    from sdk_spark.functions.png import decode_png

    arr = _rng().integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = G.truecolor_png(arr, interlace=interlace)
    assert (decode_png(data) == arr).all()


@pytest.mark.parametrize("ncolors,interlace", [
    (2, False), (3, False), (4, True), (9, False), (16, True),
    (100, False), (256, True),
])
def test_palette_depths(ncolors, interlace):
    from sdk_spark.functions.png import decode_png

    rng = _rng(ncolors)
    cols = rng.integers(0, 256, (ncolors, 3))
    idx = rng.integers(0, ncolors, (17, 31))
    data, rgb = G.palette_png(idx, cols, interlace=interlace)
    assert (decode_png(data) == rgb).all()


def test_rgba_alpha_channel():
    from sdk_spark.functions.png import decode_png

    rng = _rng(2)
    arr = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    gda = rng.integers(0, 128, (30, 40)).astype(np.uint8)
    data = G.truecolor_png(arr, alpha=gda)
    out = decode_png(data, return_alpha=True)
    assert (out[..., :3] == arr).all()
    assert (out[..., 3] == G.gd_alpha_to_png(gda)).all()
    # RGB-only view drops alpha
    assert (decode_png(data) == arr).all()


# ---- spec-assembled streams for types libgd cannot produce ---------------

def _chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png(w, h, depth, ctype, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def test_grayscale_8bit():
    from sdk_spark.functions.png import decode_png

    g = _rng(3).integers(0, 256, (9, 13), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(9))
    out = decode_png(_png(13, 9, 8, 0, raw))
    assert (out == np.repeat(g[..., None], 3, -1)).all()


def test_grayscale_subbyte_depths():
    from sdk_spark.functions.png import decode_png

    # 1-bit checkerboard, width 10 (needs 2 bytes/row, 6 pad bits)
    w, h = 10, 4
    g = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(np.uint8)
    rows = []
    for y in range(h):
        acc = 0
        for x in range(w):
            acc = (acc << 1) | int(g[y, x])
        acc <<= (16 - w)
        rows.append(b"\x00" + acc.to_bytes(2, "big"))
    out = decode_png(_png(w, h, 1, 0, b"".join(rows)))
    assert (out == np.repeat((g * 255)[..., None], 3, -1)).all()


def test_gray_alpha():
    from sdk_spark.functions.png import decode_png

    rng = _rng(4)
    g = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    a = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    ga = np.dstack([g, a])
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(6))
    out = decode_png(_png(7, 6, 8, 4, raw), return_alpha=True)
    assert (out[..., 0] == g).all() and (out[..., 3] == a).all()


def test_16bit_truecolor():
    from sdk_spark.functions.png import decode_png

    rng = _rng(5)
    hi = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    samples = (hi.astype(np.uint16) << 8) | rng.integers(
        0, 256, (5, 6, 3)).astype(np.uint16)
    raw = b"".join(b"\x00" + samples[y].astype(">u2").tobytes()
                   for y in range(5))
    out = decode_png(_png(6, 5, 16, 2, raw))
    assert (out == hi).all()          # 16-bit scales by high byte


def test_palette_trns():
    from sdk_spark.functions.png import decode_png

    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                    dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1]], dtype=np.uint8)
    raw = b"\x00" + idx.tobytes()
    extra = _chunk(b"PLTE", cols.tobytes()) + _chunk(b"tRNS",
                                                     bytes([10, 200]))
    out = decode_png(_png(4, 1, 8, 3, raw, extra), return_alpha=True)
    assert (out[0, :, :3] == cols[idx[0]]).all()
    assert list(out[0, :, 3]) == [10, 200, 255, 200]


def test_corrupt_png_raises():
    from sdk_spark.functions.png import decode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        # color type 7 does not exist
        decode_png(_png(4, 1, 8, 7, b"\x00" + b"\x00" * 4))
