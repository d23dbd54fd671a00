"""WAV codec breadth: PCM widths, IEEE float, IMA ADPCM round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.wav import (
    decode_wav, encode_wav, encode_wav_ima)


def tone(n=2000, ch=1, freq=440.0, rate=16000):
    t = np.arange(n) / rate
    x = 0.6 * np.sin(2 * np.pi * freq * t)
    if ch == 2:
        x = np.stack([x, 0.4 * np.cos(2 * np.pi * freq * t)], axis=1)
    return x


def _pcm_wav(samples, bits, rate=16000, codec=1):
    """Hand-built WAV at arbitrary bit depth for decode-breadth tests."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if codec == 3:
        data = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        data = np.clip((np.clip(samples, -1, 1) * 128 + 128).round(),
                       0, 255).astype(np.uint8).tobytes()
    elif bits == 24:
        v = (np.clip(samples, -1, 1) * ((1 << 23) - 1)).round().astype(np.int32)
        b = np.zeros((v.size, 3), np.uint8)
        flat = v.flatten()
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
    elif bits == 32:
        data = (np.clip(samples, -1, 1) * 2147483647).round() \
            .astype("<i4").tobytes()
    else:
        raise AssertionError(bits)
    ba = ch * bits // 8
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + codec.to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * ba).to_bytes(4, "little")
           + ba.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


@pytest.mark.parametrize("bits,codec,tol", [
    (8, 1, 1e-2), (24, 1, 1e-6), (32, 1, 1e-8), (32, 3, 1e-7), (64, 3, 0.0)])
def test_pcm_depths_decode(bits, codec, tol):
    x = tone(500)
    arr, rate = decode_wav(_pcm_wav(x, bits, codec=codec))
    assert rate == 16000 and arr.shape == (500, 1)
    assert np.abs(arr[:, 0] - x).max() <= tol + 1e-9


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_adpcm_roundtrip(ch):
    x = tone(3000, ch=ch)
    payload = encode_wav_ima(x, sample_rate=8000)
    arr, rate = decode_wav(payload)
    assert rate == 8000
    assert arr.shape[1] == (ch if ch > 1 else 1)
    # the fact chunk records the true length: no encoder block padding leaks
    assert arr.shape[0] == 3000
    got = arr
    want = x if ch == 2 else x[:, None]
    # ADPCM is lossy: require tight tracking on a smooth tone
    err = np.abs(got - want).max()
    assert err < 0.03, err


def test_ima_header_is_sample_zero():
    x = np.zeros(9, dtype=np.int16)
    x[0] = 12345
    payload = encode_wav_ima(x, samples_per_block=9)
    arr, _ = decode_wav(payload)
    assert int(round(arr[0, 0] * 32767)) == 12345


def test_pcm16_roundtrip_still_exact():
    x = tone(1000, ch=2)
    arr, rate = decode_wav(encode_wav(x))
    assert np.abs(arr - x).max() < 1e-4


def test_unknown_codec_raises():
    bad = _pcm_wav(tone(100), 32, codec=3)
    bad = bad.replace((3).to_bytes(2, "little") + (1).to_bytes(2, "little"),
                      (85).to_bytes(2, "little") + (1).to_bytes(2, "little"), 1)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_wav(bad)


def test_8bit_byte_zero_is_exactly_minus_one():
    raw = _pcm_wav(np.array([-1.0, 0.0, 1.0]), 8)
    arr, _ = decode_wav(raw)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    assert arr[0, 0] == -1.0
