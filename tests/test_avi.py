"""MJPEG-AVI container: spec-derived structure tests + engine sampling.

No ffmpeg/libav exists in this environment, so the container walk is
pinned against hand-built spec cases (header field placement, LIST
nesting, odd-size chunk padding, missing idx1) while the frame payloads
go through the JPEG codec that is externally validated elsewhere.
"""
from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.avi import decode_avi_frames, encode_avi_mjpeg
from sdk_spark.functions.jpeg import decode_jpeg, encode_jpeg
from sdk_spark.functions.png import psnr

RNG = np.random.default_rng(20260817)


def _smooth_frames(n, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    for i in range(n):
        f = np.stack([127 + 120 * np.sin(xx / 7 + i + c) * np.cos(yy / 9)
                      for c in range(3)], axis=-1)
        out.append(np.clip(np.round(f), 0, 255).astype(np.uint8))
    return out


def test_avi_round_trip():
    frames = _smooth_frames(5)
    jpegs = [encode_jpeg(f) for f in frames]
    avi = encode_avi_mjpeg(jpegs, 48, 32, fps=12)
    got, fps, dims = decode_avi_frames(avi)
    assert fps == 12 and dims == (48, 32) and len(got) == 5
    for raw, orig in zip(got, frames):
        assert psnr(decode_jpeg(raw), orig) >= 40.0


def test_avi_odd_sized_frames_are_padded():
    # force odd JPEG sizes by appending a COM segment of odd length
    frames = _smooth_frames(3)
    jpegs = []
    for f in frames:
        j = encode_jpeg(f)
        if len(j) % 2 == 0:
            j = j[:-2] + b"\xFF\xFE\x00\x03a" + j[-2:]   # COM before EOI
        jpegs.append(j)
    assert all(len(j) % 2 == 1 for j in jpegs)
    avi = encode_avi_mjpeg(jpegs, 48, 32)
    got, _, _ = decode_avi_frames(avi)
    assert [len(g) for g in got] == [len(j) for j in jpegs]
    for g, j in zip(got, jpegs):
        assert g == j                       # byte-exact through padding


def test_avi_without_index_still_demuxes():
    jpegs = [encode_jpeg(f) for f in _smooth_frames(2)]
    avi = bytearray(encode_avi_mjpeg(jpegs, 48, 32))
    idx = bytes(avi).rindex(b"idx1")
    trimmed = bytes(avi[:idx])              # drop idx1 (streaming writers do)
    trimmed = trimmed[:4] + (len(trimmed) - 8).to_bytes(4, "little") \
        + trimmed[8:]
    got, _, _ = decode_avi_frames(trimmed)
    assert len(got) == 2 and got[0] == jpegs[0]


def test_avi_foreign_codec_raises_by_fourcc():
    avi = bytearray(encode_avi_mjpeg([encode_jpeg(_smooth_frames(1)[0])],
                                     48, 32))
    i = bytes(avi).index(b"vidsMJPG")
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_frames(bytes(avi))


def test_avi_corrupt_raises():
    avi = encode_avi_mjpeg([encode_jpeg(_smooth_frames(1)[0])], 48, 32)
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFX" + avi[4:])
    with pytest.raises(ValueError):
        decode_avi_frames(avi[:40])
    with pytest.raises(ValueError):
        # movi list with zero frames
        body = b"AVI " + b"LIST" + (4).to_bytes(4, "little") + b"movi"
        decode_avi_frames(b"RIFF" + len(body).to_bytes(4, "little") + body)


def test_sample_frames_avi(spark):
    from sdk_spark.functions.png import decode_png
    from sdk_spark.operators.media import sample_frames

    frames = _smooth_frames(6)
    avi = encode_avi_mjpeg([encode_jpeg(f) for f in frames], 48, 32, fps=10)
    df = spark.createDataFrame([("clip", bytearray(avi))],
                               "media_id string, bytes binary")
    got = {r["frame_index"]: r for r in sample_frames(df, every_n=2).collect()}
    assert sorted(got) == [0, 2, 4]
    for i, row in got.items():
        assert psnr(decode_png(bytes(row["frame_png"])), frames[i]) >= 40.0
