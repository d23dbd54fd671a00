"""BMP + TIFF codec conformance: cross-validated against libgd / libtiff.

Same external-validation protocol as the other codec suites: fixtures
produced by the canonical implementation decode bit-exactly in ours, and
our encodings read back bit-exactly through the canonical decoder —
including libtiff's early-change LZW code widths and the horizontal
predictor.  Exotic BMP variants gd cannot write (palette depths, 16-bit
bitfields, RLE, top-down) are hand-built against the file-format spec.
"""
from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.bmp import decode_bmp, encode_bmp
from sdk_spark.functions.tiff import decode_tiff, encode_tiff
from tests import libgd_ref as G
from tests import libtiff_ref as LT

needs_gd_bmp = pytest.mark.skipif(
    not getattr(G, "HAVE_GD_BMP", False),
    reason="system libgd BMP support not available")
needs_libtiff = pytest.mark.skipif(
    not LT.HAVE_LIBTIFF, reason="system libtiff not available")

RNG = np.random.default_rng(20260817)
IMG = RNG.integers(0, 256, (45, 61, 3)).astype(np.uint8)


# -- BMP --------------------------------------------------------------------------


@pytest.mark.parametrize("w", [61, 62, 63, 64])
def test_bmp_round_trip_row_padding(w):
    img = RNG.integers(0, 256, (17, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@needs_gd_bmp
def test_bmp_libgd_cross_validation():
    payload = G.truecolor_bmp(IMG)
    assert np.array_equal(decode_bmp(payload), IMG)
    assert np.array_equal(G.gd_decode_bmp(encode_bmp(IMG)), IMG)


def _bmp_container(info: bytes, pix: bytes, palette: bytes = b"") -> bytes:
    off = 14 + len(info) + len(palette)
    return (b"BM" + (off + len(pix)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
            + info + palette + pix)


def _info_header(w: int, h: int, bpp: int, comp: int = 0,
                 clr_used: int = 0) -> bytes:
    return ((40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
            + comp.to_bytes(4, "little") + (0).to_bytes(4, "little")
            + (0).to_bytes(4, "little") * 2
            + clr_used.to_bytes(4, "little") + (0).to_bytes(4, "little"))


def test_bmp_8bit_palette():
    pal = RNG.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = RNG.integers(0, 256, (9, 13)).astype(np.uint8)
    quads = np.zeros((256, 4), np.uint8)
    quads[:, [2, 1, 0]] = pal              # BGRX
    row_bytes = (13 + 3) // 4 * 4
    rows = np.zeros((9, row_bytes), np.uint8)
    rows[:, :13] = idx
    payload = _bmp_container(_info_header(13, 9, 8), rows[::-1].tobytes(),
                             quads.tobytes())
    assert np.array_equal(decode_bmp(payload), pal[idx])


def test_bmp_4bit_and_1bit():
    pal4 = RNG.integers(0, 256, (16, 3)).astype(np.uint8)
    idx4 = RNG.integers(0, 16, (5, 7)).astype(np.uint8)
    quads = np.zeros((16, 4), np.uint8)
    quads[:, [2, 1, 0]] = pal4
    packed = np.zeros((5, 4), np.uint8)    # 7 nibbles -> 4 bytes padded
    for y in range(5):
        for x in range(7):
            packed[y, x // 2] |= idx4[y, x] << (4 if x % 2 == 0 else 0)
    payload = _bmp_container(_info_header(7, 5, 4), packed[::-1].tobytes(),
                             quads.tobytes())
    assert np.array_equal(decode_bmp(payload), pal4[idx4])

    pal1 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    bits = RNG.integers(0, 2, (3, 10)).astype(np.uint8)
    rows1 = np.zeros((3, 4), np.uint8)
    for y in range(3):
        for x in range(10):
            rows1[y, x // 8] |= bits[y, x] << (7 - x % 8)
    quads1 = np.zeros((2, 4), np.uint8)
    quads1[:, [2, 1, 0]] = pal1
    payload1 = _bmp_container(_info_header(10, 3, 1), rows1[::-1].tobytes(),
                              quads1.tobytes())
    assert np.array_equal(decode_bmp(payload1), pal1[bits])


def test_bmp_16bit_565_bitfields_and_top_down():
    r = RNG.integers(0, 32, (6, 8)).astype(np.uint32)
    g = RNG.integers(0, 64, (6, 8)).astype(np.uint32)
    b = RNG.integers(0, 32, (6, 8)).astype(np.uint32)
    vals = ((r << 11) | (g << 5) | b).astype(np.uint16)
    info = _info_header(8, -6, 16, comp=3)   # negative height: top-down
    masks = ((0xF800).to_bytes(4, "little") + (0x07E0).to_bytes(4, "little")
             + (0x001F).to_bytes(4, "little"))
    payload = _bmp_container(info + masks, vals.tobytes())
    got = decode_bmp(payload)
    expect = np.dstack([np.round(r * 255 / 31), np.round(g * 255 / 63),
                        np.round(b * 255 / 31)]).astype(np.uint8)
    assert np.array_equal(got, expect)


def test_bmp_32bit():
    img = RNG.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    px = np.zeros((4, 5, 4), np.uint8)
    px[..., [2, 1, 0]] = img               # BGRX
    payload = _bmp_container(_info_header(5, 4, 32), px[::-1].tobytes())
    assert np.array_equal(decode_bmp(payload), img)


def test_bmp_rle8():
    # row pattern: 5x color 7, 3 literal pixels, EOL; x2 rows then EOB
    pix = bytes([5, 7, 0, 3, 1, 2, 3, 0,    # absolute run padded to word
                 0, 0,                       # EOL
                 8, 9,                       # full row of color 9
                 0, 1])                      # end of bitmap
    pal = RNG.integers(0, 256, (10, 3)).astype(np.uint8)
    quads = np.zeros((10, 4), np.uint8)
    quads[:, [2, 1, 0]] = pal
    payload = _bmp_container(_info_header(8, 2, 8, comp=1, clr_used=10),
                             pix, quads.tobytes())
    got = decode_bmp(payload)
    expect_idx = np.array([[7, 7, 7, 7, 7, 1, 2, 3],
                           [9, 9, 9, 9, 9, 9, 9, 9]], np.uint8)[::-1]
    assert np.array_equal(got, pal[expect_idx])


def test_bmp_corrupt_raises():
    enc = encode_bmp(IMG)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + enc[2:])
    with pytest.raises(ValueError):
        decode_bmp(enc[:30])
    with pytest.raises(ValueError):
        decode_bmp(enc[:200])              # truncated pixel data


# -- TIFF -------------------------------------------------------------------------


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("bo", ["little", "big"])
def test_tiff_round_trip(comp, bo):
    enc = encode_tiff(IMG, compression=comp, rows_per_strip=10,
                      predictor=2 if comp in (5, 8) else 1, byte_order=bo)
    assert np.array_equal(decode_tiff(enc), IMG)


def test_tiff_gray_round_trip():
    gray = RNG.integers(0, 256, (30, 40)).astype(np.uint8)
    got = decode_tiff(encode_tiff(gray, compression=5, predictor=2))
    assert np.array_equal(got[:, :, 0], gray)
    assert np.array_equal(got[:, :, 0], got[:, :, 2])


def test_tiff_lzw_table_churn():
    g = np.tile(np.arange(256, dtype=np.uint8), (300, 6))[:, :1400]
    big = np.dstack([g, g // 2, (g * 3) % 256])
    enc = encode_tiff(big, compression=5, predictor=2, rows_per_strip=64)
    assert len(enc) < big.nbytes // 2
    assert np.array_equal(decode_tiff(enc), big)


@needs_libtiff
@pytest.mark.parametrize("comp,pred", [(5, 1), (5, 2), (32773, 1)])
def test_tiff_libtiff_cross_validation(tmp_path, comp, pred):
    path = str(tmp_path / "ref.tif")
    data = LT.write_tiff(path, IMG, comp=comp, pred=pred, rps=16)
    assert np.array_equal(decode_tiff(data), IMG)

    mine = str(tmp_path / "mine.tif")
    with open(mine, "wb") as fh:
        fh.write(encode_tiff(IMG, compression=comp, predictor=pred,
                             rows_per_strip=16))
    back = LT.read_tiff(mine, IMG.shape[1], IMG.shape[0])
    assert back is not None and np.array_equal(back, IMG)


@needs_libtiff
def test_tiff_libtiff_deflate(tmp_path):
    mine = str(tmp_path / "mine8.tif")
    with open(mine, "wb") as fh:
        fh.write(encode_tiff(IMG, compression=8, rows_per_strip=16))
    back = LT.read_tiff(mine, IMG.shape[1], IMG.shape[0])
    assert back is not None and np.array_equal(back, IMG)


def test_tiff_unsupported_features_raise_by_name():
    enc = bytearray(encode_tiff(IMG))
    # patch the IFD: turn tag 259 (compression) into 322 (tile width)
    bo = "little"
    ifd = int.from_bytes(enc[4:8], bo)
    n = int.from_bytes(enc[ifd:ifd + 2], bo)
    for i in range(n):
        e = ifd + 2 + 12 * i
        if int.from_bytes(enc[e:e + 2], bo) == 259:
            enc[e:e + 2] = (322).to_bytes(2, bo)
    with pytest.raises(NotImplementedError, match="tiles"):
        decode_tiff(bytes(enc))


def test_tiff_corrupt_raises():
    enc = encode_tiff(IMG)
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + enc[2:])
    with pytest.raises(ValueError):
        decode_tiff(enc[:60])
    bad = bytearray(encode_tiff(IMG, compression=5))
    bad[-50] ^= 0xFF                       # corrupt LZW mid-stream
    try:
        out = decode_tiff(bytes(bad))      # may still decode (bit luck)...
        assert out.shape == IMG.shape      # ...but must stay in contract
    except (ValueError, NotImplementedError):
        pass


# -- engine integration -----------------------------------------------------------


def test_decode_image_dispatches_bmp_and_tiff():
    from sdk_spark.operators.multimodal import decode_image

    assert np.array_equal(decode_image(encode_bmp(IMG)), IMG)
    assert np.array_equal(
        decode_image(encode_tiff(IMG, byte_order="big")), IMG)
    assert np.array_equal(
        decode_image(encode_tiff(IMG, compression=5, predictor=2)), IMG)
