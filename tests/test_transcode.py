"""Transcoding operator + property-based codec round trips (hypothesis).

encode_image/decode_image must be mutually inverse for every lossless
format on ARBITRARY uint8 pixel content — hypothesis drives shapes and
content, catching stride/padding/bit-packing edge cases the fixed
fixtures miss.  JPEG (lossy) is held to the engine's PSNR>=40dB
invariant instead of equality.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sdk_spark.operators.multimodal import decode_image, encode_image

LOSSLESS = ["png", "webp", "bmp", "tiff"]


@st.composite
def rgb_arrays(draw):
    h = draw(st.integers(1, 33))
    w = draw(st.integers(1, 33))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(arr=rgb_arrays(), fmt=st.sampled_from(LOSSLESS))
def test_lossless_round_trip_property(arr, fmt):
    assert np.array_equal(decode_image(encode_image(arr, fmt)), arr)


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       fx=st.floats(0.0, 0.8), fy=st.floats(0.0, 0.8),
       seed=st.integers(0, 2**31 - 1))
def test_jpeg_psnr_property(h, w, fx, fy, seed):
    """Smooth (low-frequency) content — the fixture regime the PSNR>=40dB
    invariant is defined over — must round-trip above the bar; arbitrary
    noise only gets a sanity bound (JPEG's worst case is white noise)."""
    from sdk_spark.functions.png import psnr

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    smooth = np.stack([127 + 120 * np.sin(fx * xx / 4 + i) *
                       np.cos(fy * yy / 4) for i in range(3)], axis=-1)
    smooth = np.clip(np.round(smooth), 0, 255).astype(np.uint8)
    got = decode_image(encode_image(smooth, "jpeg"))
    assert got.shape == smooth.shape
    assert psnr(got, smooth) >= 40.0 or np.array_equal(got, smooth)

    noise = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)
    got_n = decode_image(encode_image(noise, "jpeg"))
    assert psnr(got_n, noise) >= 25.0


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 20), w=st.integers(1, 20),
       npal=st.integers(1, 256), seed=st.integers(0, 2**31 - 1))
def test_gif_palette_round_trip_property(h, w, npal, seed):
    rng = np.random.default_rng(seed)
    colors = np.zeros((npal, 3), np.uint8)
    colors[:, 0] = np.arange(npal) % 256          # distinct by construction
    colors[:, 1] = rng.integers(0, 256, npal)
    img = colors[rng.integers(0, npal, (h, w))]
    assert np.array_equal(decode_image(encode_image(img, "gif")), img)


def test_encode_image_rejects_unknown_format():
    with pytest.raises(ValueError, match="unsupported output format"):
        encode_image(np.zeros((2, 2, 3), np.uint8), "avif")


def test_transcode_operator(spark):
    from sdk_spark.operators.multimodal import transcode_images

    rng = np.random.default_rng(21)
    truecolor = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    pal = np.zeros((16, 3), np.uint8)
    pal[:, 2] = np.arange(16) * 16
    paletted = pal[rng.integers(0, 16, (24, 32))]
    rows = [("tc", bytearray(encode_image(truecolor, "png"))),
            ("pal", bytearray(encode_image(paletted, "tiff"))),
            ("junk", bytearray(b"definitely not an image")),
            ("nul", None)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    for fmt, expect_tc in (("bmp", True), ("webp", True), ("gif", False)):
        got = {r["image_id"]: r
               for r in transcode_images(df, fmt).collect()}
        assert got["tc"]["ok"] is expect_tc          # truecolor > 256 colors
        assert got["pal"]["ok"] is True
        assert not got["junk"]["ok"] and not got["nul"]["ok"]
        if got["pal"]["ok"]:
            assert np.array_equal(
                decode_image(bytes(got["pal"]["bytes"])), paletted)

    with pytest.raises(ValueError, match="unsupported output format"):
        transcode_images(df, "avif")


def test_resize_out_fmt(spark):
    from sdk_spark.operators.media import resize_images

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    df = spark.createDataFrame([("a", bytearray(encode_image(img, "png")))],
                               "image_id string, bytes binary")
    for fmt in ("bmp", "tiff", "webp"):
        out = resize_images(df, 10, 10, out_fmt=fmt).collect()[0]
        dec = decode_image(bytes(out["bytes"]))
        assert dec.shape == (10, 10, 3)
        yi = np.arange(10) * 40 // 10
        assert np.array_equal(dec, img[yi][:, yi])
