"""Animated WebP (VP8X/ANIM/ANMF) container: compositing + round trips.

Frame payloads are VP8L, already proven bit-exact vs libwebp elsewhere
(tests/test_vp8l.py); this suite validates the container walk, ANMF
blending (methods 0/1) and disposal, against hand-computed expectations.
The RGBA VP8L encoder is additionally cross-checked through the real
libwebp RGBA decoder when present.
"""
from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.webp import (decode_webp, decode_webp_frames,
                                      encode_webp, encode_webp_animation)
from tests import libwebp_ref as R

needs_webp = pytest.mark.skipif(
    not R.HAVE_LIBWEBP, reason="system libwebp not available")

RNG = np.random.default_rng(20260817)


def test_rgba_still_round_trip():
    rgba = RNG.integers(0, 256, (40, 60, 4)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(rgba), return_alpha=True),
                          rgba)


@needs_webp
def test_rgba_encoder_vs_libwebp():
    rgba = RNG.integers(0, 256, (33, 57, 4)).astype(np.uint8)
    assert np.array_equal(R.decode_rgba(encode_webp(rgba)), rgba)


def test_animation_round_trip():
    frames = [RNG.integers(0, 256, (30, 50, 3)).astype(np.uint8)
              for _ in range(4)]
    anim = encode_webp_animation(frames, [40, 50, 60, 70], loop_count=3)
    got, durs, loop = decode_webp_frames(anim)
    assert durs == [40, 50, 60, 70] and loop == 3 and len(got) == 4
    for a, b in zip(got, frames):
        assert np.array_equal(a[..., :3], b)
        assert (a[..., 3] == 255).all()
    # decode_webp on an animated container returns the first frame
    assert np.array_equal(decode_webp(anim), frames[0])


def test_still_image_yields_single_frame():
    rgb = RNG.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    frames, durs, loop = decode_webp_frames(encode_webp(rgb))
    assert len(frames) == 1 and durs == [0] and loop == 1
    assert np.array_equal(frames[0][..., :3], rgb)


def test_subrect_alpha_blending():
    base = np.empty((20, 20, 4), np.uint8)
    base[...] = (10, 20, 30, 255)
    ov = np.empty((10, 10, 4), np.uint8)
    ov[...] = (200, 100, 0, 128)
    anim = encode_webp_animation([base, ov], [10, 10],
                                 offsets=[(0, 0), (4, 6)], no_blend=False)
    frames, _, _ = decode_webp_frames(anim)
    f2 = frames[1]
    # straight-alpha over: a_out = 1, c_out = c_s*a_s + c_d*(1-a_s)
    sa = 128 / 255
    expect = np.round(np.array([200, 100, 0]) * sa
                      + np.array([10, 20, 30]) * (1 - sa))
    assert np.all(np.abs(f2[6:16, 4:14, :3].astype(int) - expect) <= 1)
    assert (f2[6:16, 4:14, 3] == 255).all()
    # outside the frame rect: untouched
    assert np.array_equal(f2[0, 0], [10, 20, 30, 255])


def test_no_blend_overwrites_alpha():
    base = np.empty((8, 8, 4), np.uint8)
    base[...] = (1, 2, 3, 255)
    ov = np.empty((4, 4, 4), np.uint8)
    ov[...] = (9, 9, 9, 0)                     # fully transparent, no-blend
    anim = encode_webp_animation([base, ov], [5, 5],
                                 offsets=[(0, 0), (2, 2)], no_blend=True)
    frames, _, _ = decode_webp_frames(anim)
    assert np.array_equal(frames[1][2:6, 2:6],
                          np.broadcast_to([9, 9, 9, 0], (4, 4, 4)))


def test_dispose_to_background():
    bg = (7, 8, 9, 255)
    f1 = np.empty((6, 6, 4), np.uint8)
    f1[...] = (100, 110, 120, 255)
    f2 = np.empty((2, 2, 4), np.uint8)
    f2[...] = (0, 255, 0, 255)
    anim = encode_webp_animation(
        [f1, f2], [5, 5], offsets=[(0, 0), (2, 2)],
        dispose_bg=True, background=bg, canvas_wh=(6, 6))
    frames, _, _ = decode_webp_frames(anim)
    # frame 2 canvas: frame-1 rect was disposed to background first
    assert np.array_equal(frames[1][0, 0], bg)
    assert np.array_equal(frames[1][2:4, 2:4],
                          np.broadcast_to([0, 255, 0, 255], (2, 2, 4)))


def test_corrupt_containers_raise():
    frames = [RNG.integers(0, 256, (10, 10, 3)).astype(np.uint8)]
    anim = bytearray(encode_webp_animation(frames, [5]))
    with pytest.raises(ValueError):
        decode_webp_frames(bytes(anim[:40]))          # truncated chunk
    with pytest.raises(ValueError):
        encode_webp_animation(frames, [5], offsets=[(1, 0)])  # odd offset
    with pytest.raises(ValueError):
        encode_webp_animation(frames, [5], canvas_wh=(4, 4))  # rect escape
    bad = bytes(anim).replace(b"VP8X", b"JUNK", 1)
    with pytest.raises(ValueError):
        decode_webp_frames(bad)                       # ANIM before VP8X


def test_sample_frames_animated_webp(spark):
    from sdk_spark.functions.png import decode_png
    from sdk_spark.operators.media import sample_frames

    frames = [RNG.integers(0, 256, (16, 16, 3)).astype(np.uint8)
              for _ in range(6)]
    payload = encode_webp_animation(frames, [4] * 6)
    df = spark.createDataFrame([("wanim", bytearray(payload))],
                               "media_id string, bytes binary")
    got = {r["frame_index"]: r
           for r in sample_frames(df, every_n=2).collect()}
    assert sorted(got) == [0, 2, 4]
    for i, row in got.items():
        assert np.array_equal(decode_png(bytes(row["frame_png"])), frames[i])
