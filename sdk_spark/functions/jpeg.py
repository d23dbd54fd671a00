"""Baseline JPEG (JFIF) codec in pure numpy — no codec libraries.

Implements the ITU-T T.81 baseline sequential process: 8×8 block DCT,
Annex-K quantization + Huffman tables, 4:4:4 sampling (encoder), and a
decoder that additionally handles grayscale and 2×2/2×1 chroma subsampling.
Written for the engine's multimodal tier (north-rule: ``fmt ∈ {png, jpeg,
webp}`` with a decoded-pixel PSNR invariant — JPEG is the lossy case the
PSNR≥40dB criterion exists for).  Round 1 stubbed this behind
NotImplementedError; this replaces the stub with a real decode path.

Scope: baseline DCT process only (SOF0), no progressive (SOF2), no
arithmetic coding, no restart intervals in the encoder (the decoder skips
RST markers).  Throughput is Arrow-batch adequate for the small synthetic
tiles the fixtures use; a production deployment swaps in libjpeg-turbo
behind the same two functions.
"""

from __future__ import annotations

import numpy as np

# -- constants (ITU-T T.81 Annex K) -------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# (bits-per-length list, symbol values) — Annex K tables
DC_LUMA = ([0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_C = None


def _dct_matrix() -> np.ndarray:
    global _C
    if _C is None:
        k = np.arange(8)
        c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
        c[0, :] = 1 / np.sqrt(2)
        _C = c * 0.5
    return _C


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = []
    for qt in (QT_LUMA, QT_CHROMA):
        q = (qt * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out[0], out[1]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {cl: sym for sym, cl in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8-multiples and return (n,8,8) blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = padded.shape
    blocks = (padded.reshape(hh // 8, 8, ww // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    return blocks, hh // 8, ww // 8


def encode_jpeg(arr: np.ndarray, quality: int = 95) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    baseline 4:4:4 JFIF JPEG."""
    gray = arr.ndim == 2
    if gray:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    else:
        planes = [arr[..., 0].astype(np.float64)]
    qy, qc = _scaled_tables(quality)
    qts = [qy] + ([qc] if len(planes) > 1 else [])

    C = _dct_matrix()
    comp_coeffs = []
    for ci, plane in enumerate(planes):
        blocks, _, _ = _blockify(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", C, blocks, C)
        q = qts[min(ci, 1)].reshape(8, 8)
        comp_coeffs.append(np.round(coef / q).astype(np.int32))

    dc_tabs = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_tabs = [_build_codes(*AC_LUMA), _build_codes(*AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    nblocks = comp_coeffs[0].shape[0]
    for bi in range(nblocks):
        for ci in range(len(planes)):
            t = min(ci, 1)
            zz = comp_coeffs[ci][bi].flatten()[ZIGZAG]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_tabs[t][size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            end = last_nz[-1] + 2 if last_nz.size else 1
            for k in range(1, end):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tabs[t][0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tabs[t][(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if end < 64:
                code, length = ac_tabs[t][0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"                  # APP0
    for tid, qt in enumerate(qts):
        # DQT carries the table in zigzag order: segment[k] = Q[ZIGZAG[k]]
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid]) \
            + bytes(int(x) for x in qt[ZIGZAG])
    nc = len(planes)
    out += b"\xFF\xC0" + (8 + 3 * nc).to_bytes(2, "big") + b"\x08" \
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, 1)])       # id, 1x1, qtable
    huffs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if nc > 1:
        huffs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in huffs:
        out += b"\xFF\xC4" + (19 + len(vals)).to_bytes(2, "big") \
            + bytes([tc]) + bytes(bits[1:]) + bytes(vals)
    out += b"\xFF\xDA" + (6 + 2 * nc).to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# -- decoder ---------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    self.pos += 1          # restart marker: skip
                    continue
                else:
                    # real marker (EOI): feed zero bits from here on
                    self.pos = len(self.data)
                    byte = 0
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            self.acc <<= (n - self.nbits)
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to (h, w, 3) uint8 RGB (grayscale is
    broadcast to 3 channels for a uniform downstream shape)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = seg[p + 1:p + 1 + n]
                q = (np.frombuffer(raw, dtype=">u2") if prec
                     else np.frombuffer(raw, dtype=np.uint8)).astype(np.int32)
                qtables[tid] = q[UNZIGZAG]
                p += 1 + n
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc = seg[p]
                bits = [0] + list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htables[tc] = _build_decode(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/SOF1) JPEG is supported")
        elif marker == 0xDA:
            ns = seg[0]
            mapping = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                mapping[cs] = (tdta >> 4, tdta & 0x0F)
            scan = mapping
            data_start = pos + seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS segment")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    C = _dct_matrix()
    planes = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))

    br = _BitReader(payload[data_start:])
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tab = htables[td]           # class 0, id td
                ac_tab = htables[0x10 | ta]
                q = qtables[c["tq"]].reshape(8, 8)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = br.huff(dc_tab)
                        diff = _extend(br.read(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = br.huff(ac_tab)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        block = (zz[UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                        pix = C.T @ block @ C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    h, w = frame["h"], frame["w"]
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def psnr_jpeg_roundtrip(arr: np.ndarray, quality: int = 95) -> float:
    """Round-trip PSNR helper (test/diagnostic use)."""
    from .png import psnr

    return psnr(decode_jpeg(encode_jpeg(arr, quality)), arr)
