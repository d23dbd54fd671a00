"""FLAC codec subset (pure Python/numpy): the spec's lossless core.

Decode: ``fLaC`` container (STREAMINFO + skipped metadata blocks), frame
headers (sync, block size / sample rate / sample size tables, UTF-8-coded
frame number, CRC-8 verified), all four channel assignments (independent,
left/side, right/side, mid/side), and CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
subframes with partitioned Rice residuals (both 4- and 5-bit parameter
forms, escape code included).  Frame CRC-16 is verified.  LPC prediction
uses exact integer arithmetic (Python ints — the coefficient dot product
can exceed int64 before the shift) with the spec's arithmetic right
shift, so real-world FLAC (overwhelmingly LPC-coded) decodes
sample-exactly.

Encode: verbatim-subframe frames (spec-legal, used by every FLAC
implementation as the incompressible fallback) and quantized-LPC
subframes (Levinson-Durbin + error-feedback quantization, Rice-coded
residuals) with correct CRC-8/CRC-16 — enough to plant real FLAC
fixtures and round-trip losslessly.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run out of range")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(b: _Bits) -> int:
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("invalid FLAC UTF-8 coded number")
    v = first & (mask - 1)
    for _ in range(n):
        c = b.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_residuals(b: _Bits, n: int, predictor_order: int) -> list[int]:
    method = b.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = b.read(4)
    parts = 1 << porder
    if n % parts:
        # spec: the block size must be divisible by 2^partition_order;
        # decoding anyway would under-read residuals and desync the
        # bitstream into a confusing downstream sync/CRC error
        raise ValueError("FLAC block size not divisible by partition count")
    out: list[int] = []
    for p in range(parts):
        count = n // parts - (predictor_order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = b.read(pbits)
        if param == escape:
            raw = b.read(5)
            for _ in range(count):
                out.append(b.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = b.unary()
                r = b.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _subframe(b: _Bits, n: int, bps: int) -> np.ndarray:
    if b.read(1) != 0:
        raise ValueError("invalid FLAC subframe padding bit")
    sf_type = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.unary()
    eff = bps - wasted
    if sf_type == 0:                                    # CONSTANT
        out = np.full(n, b.read_signed(eff), dtype=np.int64)
    elif sf_type == 1:                                  # VERBATIM
        out = np.array([b.read_signed(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= sf_type <= 12:                            # FIXED order 0-4
        order = sf_type - 8
        warm = [b.read_signed(eff) for _ in range(order)]
        resid = _rice_residuals(b, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = sum(c * out[i - 1 - k] for k, c in enumerate(coefs))
            out[i] = resid[i - order] + pred
    elif sf_type >= 32:                                 # LPC order 1-32
        order = sf_type - 31
        warm = [b.read_signed(eff) for _ in range(order)]
        prec = b.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC coefficient precision")
        prec += 1
        shift = b.read_signed(5)
        if shift < 0:
            # spec reserves negative shifts; real encoders never emit them
            raise ValueError("negative FLAC LPC shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        resid = _rice_residuals(b, n, order)
        # Python ints: the coef*sample dot product can exceed int64 for
        # 32-bit samples at precision 15 before the shift
        vals: list[int] = list(warm)
        for i in range(order, n):
            pred = sum(c * vals[i - 1 - k] for k, c in enumerate(coefs))
            vals.append(resid[i - order] + (pred >> shift))
        out = np.array(vals, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type}")
    return out << wasted if wasted else out


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


@malformed_input_guard('flac')
def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples float64 in [-1,1], shape (n, channels)), rate."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if hdr & 0x7F == 0:
            info = body
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None or len(info) < 18:
        raise ValueError("FLAC STREAMINFO missing")
    rate = int.from_bytes(info[10:13], "big") >> 4
    channels = ((info[12] >> 1) & 0x7) + 1
    bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    total = ((info[13] & 0x0F) << 32) | int.from_bytes(info[14:18], "big")

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(payload):
        frame_start = pos
        b = _Bits(payload, pos)
        if b.read(14) != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        if b.read(1) != 0:
            raise ValueError("invalid FLAC frame reserved bit")
        b.read(1)                                       # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ca = b.read(4)
        ss_code = b.read(3)
        if b.read(1) != 0:
            raise ValueError("invalid FLAC frame reserved bit")
        _read_utf8_number(b)
        if bs_code == 6:
            n = b.read(8) + 1
        elif bs_code == 7:
            n = b.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            n = _BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        fbps = _BITS.get(ss_code, bps if ss_code == 0 else None)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size code {ss_code}")
        header_crc = _crc8(payload[frame_start:b.byte])
        if b.read(8) != header_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ca <= 7:                                     # independent
            if ca + 1 != channels:
                raise ValueError("FLAC frame channel count differs from "
                                 "STREAMINFO")
            subs = [_subframe(b, n, fbps) for _ in range(channels)]
        elif ca == 8:                                   # left/side
            left = _subframe(b, n, fbps)
            side = _subframe(b, n, fbps + 1)
            subs = [left, left - side]
        elif ca == 9:                                   # right/side
            side = _subframe(b, n, fbps + 1)
            right = _subframe(b, n, fbps)
            subs = [right + side, right]
        elif ca == 10:                                  # mid/side
            mid = _subframe(b, n, fbps)
            side = _subframe(b, n, fbps + 1)
            mid2 = (mid << 1) | (side & 1)
            subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ca}")
        b.align()
        frame_crc = _crc16(payload[frame_start:b.byte])
        stored = int.from_bytes(payload[b.byte:b.byte + 2], "big")
        if stored != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = b.byte + 2
        for c in range(channels):
            chans[c].extend(int(x) for x in subs[c])

    m = min(len(c) for c in chans)
    if total:
        m = min(m, total)
    arr = np.stack([np.asarray(c[:m], dtype=np.float64) for c in chans],
                   axis=1)
    return arr / float(1 << (bps - 1)), rate


def _levinson_durbin(x: np.ndarray, order: int) -> list[float]:
    """LPC coefficients (prediction: sum a_k * x[i-1-k]) via
    Levinson-Durbin on the windowed autocorrelation."""
    xf = x.astype(np.float64)
    n = len(xf)
    ac = np.array([float(np.dot(xf[: n - k], xf[k:]))
                   for k in range(order + 1)])
    if ac[0] == 0.0:
        return [0.0] * order
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - float(np.dot(a[:i], ac[i:0:-1][:i]))
        k = acc / err if err > 0 else 0.0
        a[:i], a[i] = a[:i] - k * a[i::-1][1:i + 1], k
        err *= max(1.0 - k * k, 1e-9)
    return [float(v) for v in a]


def _quantize_lpc(coefs: list[float], prec: int) -> tuple[list[int], int]:
    """Scale float LPC coefficients into ``prec``-bit ints + shift, with
    error feedback (the spec's recommended quantization)."""
    import math

    cmax = max((abs(c) for c in coefs), default=0.0)
    if cmax <= 0:
        return [0] * len(coefs), 0
    shift = max(0, min(15, prec - 2 - int(math.floor(math.log2(cmax)))))
    lim = 1 << (prec - 1)
    out, e = [], 0.0
    for c in coefs:
        v = c * (1 << shift) + e
        q = max(-lim, min(lim - 1, int(round(v))))
        e = v - q
        out.append(q)
    return out, shift


def _signed_bits(vals: list[int]) -> int:
    """Smallest two's-complement width holding every value (>=1)."""
    need = 1
    for v in vals:
        w = v.bit_length() + 1
        need = max(need, w)
    return min(need, 31)


def _write_rice(w, resid: list[int]) -> None:
    """Residual block: method 0 (4-bit params), partition order 0.
    Escape (verbatim raw bits) when the Rice unary runs would blow up."""
    zz = [(v << 1) if v >= 0 else ((-v << 1) - 1) for v in resid]
    mean = (sum(zz) / len(zz)) if zz else 0.0
    param = 0
    while param < 14 and (1 << (param + 1)) < mean + 1:
        param += 1
    total_unary = sum(z >> param for z in zz)
    w.w(0, 2)                                           # method 0
    w.w(0, 4)                                           # partition order 0
    if total_unary > 8 * len(zz) + 1024:                # pathological
        raw = _signed_bits(resid)
        w.w(15, 4)                                      # escape
        w.w(raw, 5)
        for v in resid:
            w.w(v & ((1 << raw) - 1), raw)
        return
    w.w(param, 4)
    for z in zz:
        q = z >> param
        for _ in range(q):
            w.w(0, 1)
        w.w(1, 1)
        if param:
            w.w(z & ((1 << param) - 1), param)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096, lpc_order: int | None = None,
                lpc_precision: int = 12) -> bytes:
    """Lossless FLAC encoder for fixture planting.

    Default: verbatim subframes (the incompressible fallback every
    encoder supports).  With ``lpc_order`` (1-32): real LPC subframes —
    Levinson-Durbin coefficients quantized to ``lpc_precision`` bits,
    integer residuals computed with the *identical* predictor the
    decoder runs (so the round trip is bit-exact by construction),
    Rice-coded with the standard unary/binary path (escape fallback)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0) \
            .round().astype(np.int16)
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    # the subframe header stores precision-1 in 4 bits and 0b1111 is the
    # spec's invalid sentinel, so only 1-15 are encodable; in verbatim
    # mode (no lpc_order) the argument is unused and not validated
    if lpc_order and not 1 <= lpc_precision <= 15:
        raise ValueError("FLAC LPC coefficient precision must be 1-15")
    info = bytearray(34)
    info[0:2] = block_size.to_bytes(2, "big")
    info[2:4] = block_size.to_bytes(2, "big")
    packed = (sample_rate << 12) | ((ch - 1) << 9) | ((16 - 1) << 4) \
        | ((n >> 32) & 0xF)
    info[10:14] = packed.to_bytes(4, "big")
    info[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + info

    class _W:
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

    frame_no = 0
    for b0 in range(0, n, block_size):
        blk = samples[b0:b0 + block_size]
        bn = len(blk)
        w = _W()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)                                       # fixed blocking
        w.w(7, 4)                                       # 16-bit block size - 1
        w.w(12, 4)                                      # rate in 8 bits * 1k? no: explicit 8-bit kHz
        w.w(ch - 1, 4)                                  # independent
        w.w(4, 3)                                       # 16 bps
        w.w(0, 1)
        # UTF-8 frame number (fits 7 bits for small fixtures, else 2-byte)
        if frame_no < 0x80:
            w.w(frame_no, 8)
        else:
            w.w(0xC0 | (frame_no >> 6), 8)
            w.w(0x80 | (frame_no & 0x3F), 8)
        w.w(bn - 1, 16)                                 # explicit block size
        w.w(max(1, min(255, sample_rate // 1000)), 8)   # rate in kHz
        hdr = bytes(w.buf) if w.nb == 0 else None
        if hdr is None:
            raise AssertionError("header must be byte-aligned here")
        w.w(_crc8(hdr), 8)
        for c in range(ch):
            w.w(0, 1)
            xs = [int(v) for v in blk[:, c]]
            if lpc_order and 1 <= lpc_order <= 32 and bn > lpc_order:
                order = lpc_order
                qc, shift = _quantize_lpc(
                    _levinson_durbin(blk[:, c], order), lpc_precision)
                w.w(32 + order - 1, 6)                  # LPC(order)
                w.w(0, 1)                               # no wasted bits
                for v in xs[:order]:                    # warm-up
                    w.w(v & 0xFFFF, 16)
                w.w(lpc_precision - 1, 4)
                w.w(shift & 0x1F, 5)
                for q in qc:
                    w.w(q & ((1 << lpc_precision) - 1), lpc_precision)
                resid = []
                for i in range(order, bn):
                    pred = sum(q * xs[i - 1 - k]
                               for k, q in enumerate(qc)) >> shift
                    resid.append(xs[i] - pred)
                _write_rice(w, resid)
            else:
                w.w(1, 6)                               # VERBATIM
                w.w(0, 1)                               # no wasted bits
                for v in xs:
                    w.w(v & 0xFFFF, 16)
        w.align()
        body = bytes(w.buf)
        out += body + _crc16(body).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
