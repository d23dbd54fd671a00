"""ICO container codec: PNG and DIB entries, selection, sniff, dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.bmp import encode_bmp
from sdk_spark.functions.ico import (
    decode_ico, encode_ico, ico_entries, looks_like_ico)
from sdk_spark.operators.multimodal import decode_image


def art(w, h, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)) \
        .astype(np.uint8)


def dib_ico(arr, with_mask=True, mask_bits=None):
    """Build a classic DIB-entry ICO from the engine's own BMP encoder:
    strip the 14-byte file header, double the height field, append the
    AND mask rows."""
    h, w = arr.shape[:2]
    bmp = encode_bmp(arr)
    dib = bytearray(bmp[14:])
    dib[8:12] = (2 * h).to_bytes(4, "little")
    if with_mask:
        mask_row = (w + 31) // 32 * 4
        if mask_bits is None:
            mask_bits = np.zeros((h, w), dtype=np.uint8)   # fully opaque
        rows = bytearray()
        for r in range(h - 1, -1, -1):                     # bottom-up
            packed = np.packbits(mask_bits[r], bitorder="big")
            row = bytes(packed) + b"\x00" * (mask_row - len(packed))
            rows += row[:mask_row]
        dib += rows
    entry = bytes([w % 256, h % 256, 0, 0]) \
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") \
        + len(dib).to_bytes(4, "little") + (6 + 16).to_bytes(4, "little")
    return b"\x00\x00\x01\x00\x01\x00" + entry + bytes(dib)


def test_png_entry_roundtrip():
    a = art(20, 14)
    assert np.array_equal(decode_ico(encode_ico(a)), a)


def test_multi_entry_picks_largest():
    small, big = art(8, 8, 1), art(16, 16, 2)
    payload = encode_ico([small, big])
    assert len(ico_entries(payload)) == 2
    assert np.array_equal(decode_ico(payload), big)
    assert np.array_equal(decode_ico(payload, index=0), small)


def test_dib_entry_decodes():
    a = art(10, 7)
    assert np.array_equal(decode_ico(dib_ico(a)), a)


def test_dib_entry_and_mask_alpha():
    a = art(8, 8)
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[0, :] = 1                       # top row transparent
    rgba = decode_ico(dib_ico(a, mask_bits=mask), return_alpha=True)
    assert rgba.shape == (8, 8, 4)
    assert (rgba[0, :, 3] == 0).all()
    assert (rgba[1:, :, 3] == 255).all()
    assert np.array_equal(rgba[..., :3], a)


def test_sniff_rejects_garbage():
    assert not looks_like_ico(b"\x00\x00\x01\x00\xff\xff" + b"x" * 64)
    assert not looks_like_ico(b"GIF89a" + b"\x00" * 64)
    assert not looks_like_ico(b"\x00" * 4)
    # entry pointing past the payload
    bad = bytearray(encode_ico(art(4, 4)))
    bad[14:18] = (1 << 30).to_bytes(4, "little")
    assert not looks_like_ico(bytes(bad))


def test_decode_image_dispatch():
    a = art(12, 9)
    assert np.array_equal(decode_image(encode_ico(a)), a)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 16)


def test_entry_index_out_of_range():
    with pytest.raises(ValueError):
        decode_ico(encode_ico(art(4, 4)), index=3)


def test_256_wide_entry_roundtrip():
    a = art(256, 5)
    payload = encode_ico(a)
    assert ico_entries(payload)[0]["w"] == 256
    assert np.array_equal(decode_ico(payload), a)


def test_dib_entry_top_down():
    """Negative-height (top-down) DIB entries must not be flipped."""
    a = art(6, 4)
    h, w = a.shape[:2]
    bmp = encode_bmp(a)
    dib = bytearray(bmp[14:])
    # rewrite the pixel rows in top-down order and negate the height
    row_bytes = (w * 3 + 3) // 4 * 4
    pix_off = 40   # BITMAPINFOHEADER, 24bpp, no palette
    rows = [bytes(dib[pix_off + r * row_bytes:pix_off + (r + 1) * row_bytes])
            for r in range(h)]
    flat = b"".join(reversed(rows))          # bottom-up -> top-down
    dib[pix_off:pix_off + h * row_bytes] = flat
    dib[8:12] = (-2 * h) % (1 << 32) and (-2 * h).to_bytes(
        4, "little", signed=True)
    entry = bytes([w % 256, h % 256, 0, 0]) \
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") \
        + len(dib).to_bytes(4, "little") + (6 + 16).to_bytes(4, "little")
    payload = b"\x00\x00\x01\x00\x01\x00" + entry + bytes(dib)
    assert np.array_equal(decode_ico(payload), a)


def test_encode_ico_caps_entries():
    with pytest.raises(ValueError):
        encode_ico([art(2, 2)] * 65)
