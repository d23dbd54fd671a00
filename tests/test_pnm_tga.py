"""PNM and TGA codecs: round trips, spec edges, dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.pnm import decode_pnm, encode_pnm
from sdk_spark.functions.tga import decode_tga, encode_tga, looks_like_tga
from sdk_spark.operators.multimodal import decode_image, encode_image


def art(w, h, seed=11, ch=3):
    a = np.random.RandomState(seed).randint(0, 256, (h, w, ch))
    return a.astype(np.uint8)


def test_pnm_p6_roundtrip():
    a = art(17, 9)
    assert np.array_equal(decode_pnm(encode_pnm(a)), a)


def test_pnm_p5_gray():
    g = art(8, 6)[..., 0]
    out = decode_pnm(encode_pnm(g))
    assert np.array_equal(out[..., 0], g) and np.array_equal(out[..., 1], g)


def test_pnm_comments_and_16bit():
    payload = b"P6 # a comment\n# another\n 2 1\n65535\n" + \
        (0).to_bytes(2, "big") + (65535).to_bytes(2, "big") * 5
    out = decode_pnm(payload)
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 0] == 0 and out[0, 1, 0] == 255


def test_pnm_truncation_fails():
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n4 4\n255\nxx")


def test_tga_raw_and_rle_roundtrip():
    a = art(19, 7)
    payload = encode_tga(a)                     # RLE top-down
    assert looks_like_tga(payload)
    assert np.array_equal(decode_tga(payload), a)


def test_tga_rgba_alpha():
    a = art(6, 5, ch=4)
    out = decode_tga(encode_tga(a), return_alpha=True)
    assert np.array_equal(out, a)


def test_tga_bottom_up_raw_type2():
    a = art(4, 3)
    h, w = a.shape[:2]
    head = bytearray(18)
    head[2] = 2
    head[12:14] = w.to_bytes(2, "little")
    head[14:16] = h.to_bytes(2, "little")
    head[16] = 24                               # bottom-up (bit 5 clear)
    body = a[::-1][..., ::-1].tobytes()         # rows bottom-up, BGR
    assert np.array_equal(decode_tga(bytes(head) + body), a)


def test_tga_solid_compresses():
    a = np.full((32, 32, 3), 99, np.uint8)
    payload = encode_tga(a)
    assert len(payload) < 18 + 64               # pure run packets
    assert np.array_equal(decode_tga(payload), a)


def test_tga_sniff_rejects():
    assert not looks_like_tga(b"\x00" * 17)
    assert not looks_like_tga(b"qoif" + b"\x00" * 20)


def test_dispatch_and_transcode():
    a = art(10, 8, seed=5)
    assert np.array_equal(decode_image(encode_image(a, "pnm")), a)
    assert np.array_equal(decode_image(encode_image(a, "tga")), a)
