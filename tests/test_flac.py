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


def build_lpc_stream(samples, coefs, shift, prec=12, param=4):
    """Hand-encode ONE frame with an LPC(len(coefs)) subframe around
    KNOWN quantized coefficients — independent of the library's encoder,
    so decoder correctness is checked against a straight-line Python
    recurrence, not a round trip."""
    order = len(coefs)
    n = len(samples)
    info = bytearray(34)
    info[0:2] = info[2:4] = n.to_bytes(2, "big")
    packed = (8000 << 12) | (0 << 9) | (15 << 4)
    info[10:14] = packed.to_bytes(4, "big")
    info[14:18] = n.to_bytes(4, "big")
    out = bytearray(b"fLaC") + bytes([0x80]) + (34).to_bytes(3, "big") + info

    w = _W()
    w.w(0x3FFE, 14); w.w(0, 1); w.w(0, 1)
    w.w(7, 4); w.w(12, 4); w.w(0, 4); w.w(4, 3); w.w(0, 1)
    w.w(0, 8)
    w.w(n - 1, 16)
    w.w(8, 8)
    hdr = bytes(w.buf)
    w.w(_crc8(hdr), 8)
    # subframe: LPC(order)
    w.w(0, 1); w.w(32 + order - 1, 6); w.w(0, 1)
    for s in samples[:order]:
        w.w(int(s) & 0xFFFF, 16)
    w.w(prec - 1, 4)
    w.w(shift & 0x1F, 5)
    for c in coefs:
        w.w(c & ((1 << prec) - 1), prec)
    w.w(0, 2); w.w(0, 4); w.w(param, 4)
    for i in range(order, n):
        pred = sum(c * int(samples[i - 1 - k])
                   for k, c in enumerate(coefs)) >> shift
        resid = int(samples[i]) - pred
        zz = (resid << 1) if resid >= 0 else ((-resid) << 1) - 1
        q, r = zz >> param, zz & ((1 << param) - 1)
        w.w(0, q); w.w(1, 1)
        w.w(r, param)
    w.align()
    body = bytes(w.buf)
    return bytes(out) + body + _crc16(body).to_bytes(2, "big")


@pytest.mark.parametrize("coefs,shift", [
    ([1024], 10),                       # x[i-1] predictor
    ([1638, -614], 10),                 # damped second-order
    ([1500, 700, -300, 100], 11),
])
def test_lpc_subframe_decodes_exactly(coefs, shift):
    rng = np.random.RandomState(len(coefs))
    base = np.cumsum(rng.randint(-15, 16, 96)).astype(np.int64) + 50
    payload = build_lpc_stream(base, coefs, shift)
    arr, rate = decode_flac(payload)
    assert rate == 8000
    assert np.array_equal(to_i16(arr)[:, 0].astype(np.int64), base)


@pytest.mark.parametrize("order", [1, 2, 8, 16, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_lpc_encoder_roundtrip(order, ch):
    data = tone(3000, ch=ch)
    blob = encode_flac(data, 16000, block_size=1024, lpc_order=order)
    arr, rate = decode_flac(blob)
    want = data[:, None] if data.ndim == 1 else data
    assert rate == 16000
    assert np.array_equal(to_i16(arr), want)
    # LPC actually engaged and compressed vs verbatim
    verb = encode_flac(data, 16000, block_size=1024)
    assert len(blob) < len(verb)


def test_lpc_noise_roundtrip_exact():
    """Incompressible input: Rice params go high / escape may engage —
    the round trip must still be bit-exact."""
    rng = np.random.RandomState(9)
    data = rng.randint(-32768, 32768, 2000).astype(np.int16)
    arr, _ = decode_flac(encode_flac(data, 8000, block_size=512,
                                     lpc_order=8))
    assert np.array_equal(to_i16(arr)[:, 0], data)


def test_encoder_rejects_unencodable_lpc_precision():
    """precision-1 is a 4-bit field whose 0b1111 value is the spec's
    invalid sentinel, so 16 would emit a stream our own decoder rejects
    and 17+ would silently wrap the field — both must fail at encode
    time (r4 review finding)."""
    data = np.zeros(512, dtype=np.int16)
    for prec in (0, 16, 17):
        with pytest.raises(ValueError, match="precision"):
            encode_flac(data, 8000, block_size=512, lpc_order=4,
                        lpc_precision=prec)
    # verbatim mode never writes the precision field, so it is not
    # validated there — previously-valid calls must stay valid
    arr, _ = decode_flac(encode_flac(data, 8000, block_size=512,
                                     lpc_precision=16))
    assert arr.shape[0] == 512


def test_rice_partition_divisibility_fails_closed():
    """porder that does not divide the block size must raise the precise
    diagnostic, not desync into a confusing later CRC error."""
    base = np.cumsum(np.ones(100, dtype=np.int64)) + 3
    payload = bytearray(build_fixed_stream(base, 0))
    # locate the rice header: subframe starts after the 9-byte frame
    # header; FIXED(0) has no warmup, so method/porder bits follow the
    # subframe header byte. porder lives in bits 2..5 of that byte.
    sub0 = 42 + 9 + 1          # metadata(42) + frame header(9) + subframe hdr
    payload[sub0] = (payload[sub0] & 0b11000011) | (3 << 2)  # porder=3
    with pytest.raises(ValueError, match="divisible"):
        decode_flac(bytes(payload))


def test_audio_features_decodes_flac(spark):
    from sdk_spark.operators.media import audio_features

    rows = [("f", bytearray(encode_flac(tone(4000, ch=2), 16000)))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = audio_features(df).collect()[0]
    assert out["decode_ok"] and out["channels"] == 2
    assert abs(out["duration_sec"] - 0.25) < 1e-6
