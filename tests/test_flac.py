"""FLAC subset codec: round trips, fixed/rice paths, CRCs, LPC gate."""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.flac import (
    _crc8, _crc16, decode_flac, encode_flac)


def tone(n=5000, ch=1):
    x = (np.sin(np.arange(n) / 7) * 12000).astype(np.int16)
    if ch == 2:
        return np.stack([x, (x // 3).astype(np.int16)], axis=1)
    return x


def to_i16(arr):
    return (arr * 32768).round().astype(np.int16)


@pytest.mark.parametrize("ch", [1, 2])
def test_verbatim_roundtrip(ch):
    data = tone(ch=ch)
    arr, rate = decode_flac(encode_flac(data, 16000, block_size=1024))
    want = data[:, None] if data.ndim == 1 else data
    assert rate == 16000
    assert np.array_equal(to_i16(arr), want)


def test_multi_frame_and_partial_last_block():
    data = tone(2500)                      # 2 full + 1 partial block @1024
    arr, _ = decode_flac(encode_flac(data, 8000, block_size=1024))
    assert np.array_equal(to_i16(arr)[:, 0], data)


class _W:
    """Minimal MSB-first bit writer for hand-built frames."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.buf.append(self.acc)
                self.acc = self.nb = 0

    def align(self):
        while self.nb:
            self.w(0, 1)


def build_fixed_stream(samples, order, param=3):
    """Hand-encode ONE frame with a FIXED(order) subframe + rice
    residuals (single partition) around known warmup samples."""
    from sdk_spark.functions.flac import _FIXED_COEFS

    n = len(samples)
    info = bytearray(34)
    info[0:2] = info[2:4] = n.to_bytes(2, "big")
    packed = (8000 << 12) | (0 << 9) | (15 << 4)
    info[10:14] = packed.to_bytes(4, "big")
    info[14:18] = n.to_bytes(4, "big")
    out = bytearray(b"fLaC") + bytes([0x80]) + (34).to_bytes(3, "big") + info

    w = _W()
    w.w(0x3FFE, 14); w.w(0, 1); w.w(0, 1)
    w.w(7, 4)                  # 16-bit blocksize follows
    w.w(12, 4)                 # 8-bit kHz rate follows
    w.w(0, 4)                  # mono
    w.w(4, 3)                  # 16 bps
    w.w(0, 1)
    w.w(0, 8)                  # frame 0
    w.w(n - 1, 16)
    w.w(8, 8)                  # 8 kHz
    hdr = bytes(w.buf)
    w.w(_crc8(hdr), 8)
    # subframe: FIXED(order)
    w.w(0, 1); w.w(8 + order, 6); w.w(0, 1)
    coefs = _FIXED_COEFS[order]
    for s in samples[:order]:
        w.w(int(s) & 0xFFFF, 16)
    w.w(0, 2)                  # 4-bit rice method
    w.w(0, 4)                  # partition order 0
    w.w(param, 4)
    for i in range(order, n):
        pred = sum(c * samples[i - 1 - k] for k, c in enumerate(coefs))
        resid = int(samples[i]) - pred
        zz = (resid << 1) if resid >= 0 else ((-resid) << 1) - 1
        q, r = zz >> param, zz & ((1 << param) - 1)
        w.w(0, q); w.w(1, 1)   # unary quotient
        w.w(r, param)
    w.align()
    body = bytes(w.buf)
    return bytes(out) + body + _crc16(body).to_bytes(2, "big")


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_subframe_orders(order):
    rng = np.random.RandomState(order)
    base = np.cumsum(rng.randint(-20, 21, 64)).astype(np.int64) + 100
    payload = build_fixed_stream(base, order)
    arr, rate = decode_flac(payload)
    assert rate == 8000
    assert np.array_equal(to_i16(arr)[:, 0].astype(np.int64), base)


def test_crc_corruption_fails_closed():
    payload = bytearray(encode_flac(tone(600), block_size=512))
    payload[-3] ^= 0x40                    # flip a bit inside the last frame
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


def test_lpc_raises_by_name():
    # hand-build a frame whose first subframe type is LPC order 1 (0x20)
    payload = bytearray(encode_flac(tone(300), block_size=256))
    # find first frame: after metadata (4 + 4 + 34)
    frame = 42
    # subframe header starts right after the 4-byte-aligned frame header;
    # easier: decode normally works, so instead patch the subframe type
    # byte (first byte after header CRC): locate via known header length
    # 14+1+1+4+4+4+3+1 bits = 4 bytes, + 1 utf8 + 2 blocksize + 1 rate + 1 crc
    sub0 = frame + 4 + 1 + 2 + 1 + 1
    payload[sub0] = 0x40                   # 0 pad + type 0x20 (LPC o1) + 0
    with pytest.raises((NotImplementedError, ValueError)):
        decode_flac(bytes(payload))


def test_audio_features_decodes_flac(spark):
    from sdk_spark.operators.media import audio_features

    rows = [("f", bytearray(encode_flac(tone(4000, ch=2), 16000)))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = audio_features(df).collect()[0]
    assert out["decode_ok"] and out["channels"] == 2
    assert abs(out["duration_sec"] - 0.25) < 1e-6
