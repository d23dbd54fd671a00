"""Audio/video multimodal tier: real WAV decode, real resize, frame sampling."""

from __future__ import annotations

import numpy as np
import pytest


def test_wav_roundtrip():
    from sdk_spark.functions.wav import decode_wav, encode_wav

    t = np.linspace(0, 1, 16000, endpoint=False)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(tone, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out, rate = decode_wav(payload)
    assert rate == 16000 and out.shape == (16000, 1)
    assert np.max(np.abs(out[:, 0] - tone)) < 1e-3  # int16 quantization
    stereo = np.stack([tone, -tone], axis=1)
    out2, _ = decode_wav(encode_wav(stereo))
    assert out2.shape == (16000, 2)
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_audio_features_spark(spark):
    from sdk_spark.functions.wav import encode_wav
    from sdk_spark.operators.media import audio_features

    t = np.linspace(0, 0.5, 8000, endpoint=False)
    rows = [
        ("tone", bytearray(encode_wav(0.5 * np.sin(2 * np.pi * 100 * t), 16000))),
        ("silence", bytearray(encode_wav(np.zeros(8000), 16000))),
        ("garbage", bytearray(b"\x00\x01\x02")),
        ("missing", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got["tone"]["decode_ok"] and abs(got["tone"]["duration_sec"] - 0.5) < 1e-6
    assert 0.3 < got["tone"]["rms"] < 0.4  # sine RMS = 0.5/sqrt(2)
    assert got["tone"]["zero_cross_rate"] > 0
    assert got["silence"]["rms"] == 0.0
    assert not got["garbage"]["decode_ok"] and not got["missing"]["decode_ok"]


def test_resize_images_spark(spark):
    from sdk_spark.functions.jpeg import encode_jpeg
    from sdk_spark.functions.png import decode_png, encode_png
    from sdk_spark.operators.media import resize_images

    yy, xx = np.mgrid[0:20, 0:16]
    img = np.stack([(xx * 9) % 256, (yy * 7) % 256,
                    np.full((20, 16), 3)], axis=2).astype(np.uint8)
    rows = [("p", bytearray(encode_png(img))),
            ("j", bytearray(encode_jpeg(img, 95)))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in resize_images(df, 8, 8).collect()}
    for key in ("p", "j"):
        assert got[key]["w"] == 8 and got[key]["h"] == 8
        out = decode_png(bytes(got[key]["bytes"]))
        assert out.shape == (8, 8, 3)
    # nearest-neighbor on the lossless path is exact subsampling
    exact = img[(np.arange(8) * 20 // 8)][:, (np.arange(8) * 16 // 8)]
    assert np.array_equal(decode_png(bytes(got["p"]["bytes"])), exact)


def test_frame_sampling_spark(spark):
    from sdk_spark.operators.media import encode_rawv, sample_frames

    frames = [np.full((6, 5, 3), 10 * i, dtype=np.uint8) for i in range(7)]
    rows = [("clip", bytearray(encode_rawv(frames))),
            ("notvideo", bytearray(b"MP4 blah"))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = sample_frames(df, every_n=3).collect()
    by_idx = {r["frame_index"]: r for r in got if r["media_id"] == "clip"}
    assert sorted(by_idx) == [0, 3, 6]
    assert abs(by_idx[3]["mean_luma"] - 30.0) < 1e-9
    assert not [r for r in got if r["media_id"] == "notvideo"]
