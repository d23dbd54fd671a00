"""GIF codec conformance: bit-exact vs the system libgd, both directions.

Same external-validation protocol as tests/test_vp8.py (libwebp) and
tests/test_png_full.py (libgd/libpng): fixtures are produced by the real
codec and decoded by ours (and vice versa), so the bitstream — LZW width
growth, interlace reordering, palette handling — is proven against an
independent implementation, not just round-trip-consistent.

Reference parity note: the json-structure reference SDK has no image
codecs; this suite covers the engine's multimodal decode-breadth tier.
"""
from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.gif import (decode_gif, decode_gif_frames,
                                     encode_gif, encode_gif_animation)
from tests import libgd_ref as G

needs_gd = pytest.mark.skipif(
    not getattr(G, "HAVE_GD_GIF", False),
    reason="system libgd GIF support not available")

RNG = np.random.default_rng(20260817)


def _palette_img(npal: int, h: int, w: int):
    colors = RNG.integers(0, 256, (npal, 3)).astype(np.uint8)
    colors[:, 0] = np.arange(npal)          # force distinct colors
    idx = RNG.integers(0, npal, (h, w)).astype(np.uint8)
    return colors, idx


# -- round trips (no external codec needed) ---------------------------------------


def test_round_trip_full_palette():
    colors, idx = _palette_img(256, 120, 200)
    img = colors[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_round_trip_interlaced():
    colors, idx = _palette_img(256, 61, 47)   # odd dims hit pass boundaries
    img = colors[idx]
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_round_trip_lzw_table_reset():
    # long repetitive runs grow the LZW table past 4096 -> CLEAR + reset
    g = np.tile(np.arange(256, dtype=np.uint8), (400, 4))[:, :900]
    img = np.dstack([g, g // 2, g // 3])
    enc = encode_gif(img)
    assert len(enc) < img.nbytes // 8       # actually compresses
    assert np.array_equal(decode_gif(enc), img)


@pytest.mark.parametrize("npal", [2, 3, 4, 5, 16, 17, 64, 129])
def test_round_trip_palette_sizes(npal):
    colors, idx = _palette_img(npal, 37, 53)
    img = colors[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_too_many_colors_raises():
    img = RNG.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    img[..., 0] = np.arange(1600).reshape(40, 40) % 251   # >256 distinct
    img[..., 1] = (np.arange(1600).reshape(40, 40) // 251) * 37
    with pytest.raises(ValueError, match="palette-exact"):
        encode_gif(img)


def test_animation_round_trip():
    colors, _ = _palette_img(64, 1, 1)
    frames = [colors[RNG.integers(0, 64, (30, 44))] for _ in range(6)]
    payload = encode_gif_animation(frames, [5, 10, 15, 20, 25, 30],
                                   loop_count=2)
    got, delays, loop = decode_gif_frames(payload)
    assert delays == [5, 10, 15, 20, 25, 30] and loop == 2
    assert len(got) == 6
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


# -- compositing semantics (hand-built containers) --------------------------------


def _minimal_gif(frames_blocks: bytes, w: int, h: int,
                 gct: bytes, gct_bits: int, bg: int = 0) -> bytes:
    head = (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0x80 | (gct_bits - 1)]) + bytes([bg, 0]) + gct)
    return head + frames_blocks + b"\x3B"


def _raw_frame(idx: np.ndarray, fx: int, fy: int) -> bytes:
    """Image descriptor + uncompressed-ish LZW for a small index map."""
    from sdk_spark.functions.gif import _lzw_encode

    h, w = idx.shape
    out = bytearray(b"\x2C")
    out += fx.to_bytes(2, "little") + fy.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    out.append(2)
    out += _lzw_encode(idx.reshape(-1), 2)
    return bytes(out)


GCT4 = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])


def test_transparency_composites_over_previous_frame():
    # frame 1: all red; frame 2: color 1 with transparent holes (index 3)
    f1 = _raw_frame(np.zeros((4, 4), np.uint8), 0, 0)
    idx2 = np.full((4, 4), 1, np.uint8)
    idx2[1:3, 1:3] = 3                      # transparent pixels
    gce = b"\x21\xF9\x04\x01\x00\x00\x03\x00"   # transparency on, index 3
    f2 = gce + _raw_frame(idx2, 0, 0)
    frames, _, _ = decode_gif_frames(_minimal_gif(f1 + f2, 4, 4, GCT4, 2))
    assert len(frames) == 2
    assert np.array_equal(frames[0], np.broadcast_to([255, 0, 0], (4, 4, 3)))
    expect = np.broadcast_to([0, 255, 0], (4, 4, 3)).copy()
    expect[1:3, 1:3] = [255, 0, 0]          # holes show frame 1
    assert np.array_equal(frames[1], expect)


def test_disposal_restore_background_and_previous():
    base = _raw_frame(np.zeros((4, 4), np.uint8), 0, 0)        # red canvas
    # frame 2 paints a 2x2 blue square at (1,1), disposal=2 (restore bg)
    gce2 = b"\x21\xF9\x04" + bytes([2 << 2]) + b"\x00\x00\x00\x00"
    f2 = gce2 + _raw_frame(np.full((2, 2), 2, np.uint8), 1, 1)
    # frame 3 paints one white pixel at (0,0), disposal=3 (restore previous)
    gce3 = b"\x21\xF9\x04" + bytes([3 << 2]) + b"\x00\x00\x00\x00"
    f3 = gce3 + _raw_frame(np.full((1, 1), 3, np.uint8), 0, 0)
    f4 = _raw_frame(np.full((1, 1), 1, np.uint8), 3, 3)
    payload = _minimal_gif(base + f2 + f3 + f4, 4, 4, GCT4, 2, bg=3)
    frames, _, _ = decode_gif_frames(payload)
    assert len(frames) == 4
    red = np.broadcast_to([255, 0, 0], (4, 4, 3)).copy()
    # frame 2 visible: blue square over red
    e2 = red.copy(); e2[1:3, 1:3] = [0, 0, 255]
    assert np.array_equal(frames[1], e2)
    # frame 3: bg (white) restored under the old square, white dot at 0,0
    e3 = red.copy(); e3[1:3, 1:3] = [255, 255, 255]; e3[0, 0] = [255, 255, 255]
    assert np.array_equal(frames[2], e3)
    # frame 4: previous canvas restored (dot gone), green dot at 3,3
    e4 = red.copy(); e4[1:3, 1:3] = [255, 255, 255]; e4[3, 3] = [0, 255, 0]
    assert np.array_equal(frames[3], e4)


# -- corruption handling ----------------------------------------------------------


def test_corrupt_inputs_raise_cleanly():
    colors, idx = _palette_img(16, 20, 20)
    enc = encode_gif(colors[idx])
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + enc[6:])
    with pytest.raises(ValueError):
        decode_gif(enc[:9])                  # truncated header
    with pytest.raises(ValueError):
        decode_gif(enc[:40])                 # truncated mid color table/blocks
    # frame rect escaping the logical screen
    bad = bytearray(enc)
    bad[6:8] = (2).to_bytes(2, "little")     # shrink screen width under frame
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


# -- external-codec conformance (libgd) -------------------------------------------


@needs_gd
@pytest.mark.parametrize("interlace", [False, True])
def test_libgd_encoded_decodes_exactly(interlace):
    colors, idx = _palette_img(256, 90, 130)
    payload, rgb = G.palette_gif(idx, colors, interlace=interlace)
    assert np.array_equal(decode_gif(payload), rgb)


@needs_gd
@pytest.mark.parametrize("interlace", [False, True])
def test_our_encoder_decodes_in_libgd(interlace):
    colors, idx = _palette_img(256, 90, 130)
    img = colors[idx]
    assert np.array_equal(
        G.gd_decode_gif(encode_gif(img, interlace=interlace)), img)


@needs_gd
@pytest.mark.parametrize("npal", [2, 5, 17, 129])
def test_libgd_cross_validation_palette_sizes(npal):
    colors, idx = _palette_img(npal, 37, 53)
    payload, rgb = G.palette_gif(idx, colors)
    assert np.array_equal(decode_gif(payload), rgb)
    img = colors[idx]
    assert np.array_equal(G.gd_decode_gif(encode_gif(img)), img)


# -- engine integration -----------------------------------------------------------


def test_decode_image_dispatches_gif():
    from sdk_spark.operators.multimodal import decode_image

    colors, idx = _palette_img(32, 24, 31)
    img = colors[idx]
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_sample_frames_animated_gif(spark):
    from sdk_spark.functions.png import decode_png
    from sdk_spark.operators.media import sample_frames

    colors, _ = _palette_img(8, 1, 1)
    frames = [colors[RNG.integers(0, 8, (16, 16))] for _ in range(7)]
    payload = encode_gif_animation(frames, [4] * 7)
    df = spark.createDataFrame([("anim", bytearray(payload))],
                               "media_id string, bytes binary")
    got = {r["frame_index"]: r for r in sample_frames(df, every_n=3).collect()}
    assert sorted(got) == [0, 3, 6]
    for i, row in got.items():
        assert np.array_equal(decode_png(bytes(row["frame_png"])), frames[i])
        assert row["mean_luma"] == pytest.approx(float(frames[i].mean()))
