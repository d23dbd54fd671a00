"""QOI codec: spec vectors, op-path round trips, dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.qoi import decode_qoi, encode_qoi
from sdk_spark.operators.multimodal import decode_image, encode_image


def rt(arr, **kw):
    return decode_qoi(encode_qoi(arr), **kw)


def test_rgb_roundtrip_random():
    a = np.random.RandomState(1).randint(0, 256, (23, 31, 3)).astype(np.uint8)
    assert np.array_equal(rt(a), a)


def test_rgba_roundtrip():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    assert np.array_equal(rt(a, return_alpha=True), a)
    assert np.array_equal(rt(a), a[..., :3])


def test_long_runs_cross_62():
    a = np.full((10, 40, 3), 7, np.uint8)          # 400-pixel run
    payload = encode_qoi(a)
    assert len(payload) < 14 + 8 + 12              # a handful of RUN ops
    assert np.array_equal(decode_qoi(payload), a)


def test_diff_and_luma_paths():
    # gentle gradients exercise DIFF (±2) and LUMA (±31 green) ops
    base = np.arange(0, 200, dtype=np.int16)
    row = np.stack([base, base + 1, base - 1], axis=1) % 256
    a = np.tile(row[None, :, :], (3, 1, 1)).astype(np.uint8)
    assert np.array_equal(rt(a), a)


def test_index_hash_path():
    # alternating two colors: second occurrences hit the hash table
    a = np.zeros((2, 64, 3), np.uint8)
    a[:, ::2] = (10, 20, 30)
    a[:, 1::2] = (200, 100, 50)
    payload = encode_qoi(a)
    assert np.array_equal(decode_qoi(payload), a)


def test_spec_vector_hand_built():
    """Hand-assembled stream: RGB op, RUN of 2, INDEX back to first."""
    head = b"qoif" + (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([3, 0])
    # px0: RGB(1,2,3); px1-2: run 2 of same; px3: RGB(9,9,9)
    stream = bytes([0xFE, 1, 2, 3]) + bytes([0xC0 | 1]) + bytes([0xFE, 9, 9, 9])
    out = decode_qoi(head + stream + b"\x00" * 7 + b"\x01")
    want = np.array([[[1, 2, 3], [1, 2, 3]], [[1, 2, 3], [9, 9, 9]]], np.uint8)
    assert np.array_equal(out, want)


def test_truncation_and_bad_magic_fail_closed():
    a = np.random.RandomState(3).randint(0, 256, (8, 8, 3)).astype(np.uint8)
    p = encode_qoi(a)
    with pytest.raises(ValueError):
        decode_qoi(p[:20])
    with pytest.raises(ValueError):
        decode_qoi(b"qoix" + p[4:])


def test_decode_image_dispatch_and_transcode():
    a = np.random.RandomState(4).randint(0, 256, (12, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_qoi(a)), a)
    assert np.array_equal(decode_image(encode_image(a, "qoi")), a)


@pytest.mark.parametrize("chunk", [b"\xFE\x10\x20",       # RGB, 1 operand short
                                   b"\xFF\x10\x20\x30",   # RGBA, 1 short
                                   b"\x80"])              # LUMA, operand missing
def test_truncated_chunk_operands_fail_closed(chunk):
    """Operand bytes truncated against the end marker must raise, not
    silently consume the 0x00 end-marker bytes as pixel data."""
    hdr = b"qoif" + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") \
        + bytes([3, 0])
    bad = hdr + chunk + b"\x00" * 7 + b"\x01"
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(bad)
