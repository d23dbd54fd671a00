"""JPEG (JFIF) codec in pure numpy — no codec libraries.

Implements the ITU-T T.81 baseline sequential process (SOF0/SOF1) AND the
progressive DCT process (SOF2: spectral selection + successive
approximation, DC/AC first and refinement scans, EOB-run coding), with
restart intervals (DRI/RSTn: DC-predictor + EOB-run reset and bit
realignment at every marker) in both processes.  8×8 block DCT, Annex-K
quantization + Huffman tables, 4:4:4 sampling (encoder), grayscale and
2×2/2×1 chroma subsampling (decoder).  Written for the engine's multimodal
tier (north-rule: ``fmt ∈ {png, jpeg, webp}`` with a decoded-pixel PSNR
invariant — JPEG is the lossy case the PSNR≥40dB criterion exists for);
progressive is the dominant real-crawl encoding, so the decoder treats it
as first-class, and a progressive *encoder* (libjpeg-style scan script
incl. AC refinement) exists so fixtures need no external images.

Scope: no arithmetic coding (SOF9+ raises), no hierarchical process.
Throughput is Arrow-batch adequate for the small synthetic tiles the
fixtures use; a production deployment swaps in libjpeg-turbo behind the
same functions.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

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


#: LUTs keyed by the raw DHT payload — standard (Annex K) tables repeat
#: across virtually all files, so the 65536-entry build amortizes to zero
_LUT_CACHE: dict[bytes, list[int]] = {}


def _build_lut(decode_table: dict[tuple[int, int], int],
               raw_key: bytes | None = None) -> list[int]:
    """16-bit peek LUT: entry = (code_length << 8) | symbol, 0 = invalid.

    One list index replaces the bit-by-bit dict walk in the baseline hot
    loop (max JPEG code length is 16, so a 65536-entry table is exact)."""
    if raw_key is not None:
        cached = _LUT_CACHE.get(raw_key)
        if cached is not None:
            return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (code, length), sym in decode_table.items():
        start = code << (16 - length)
        lut[start:start + (1 << (16 - length))] = (length << 8) | sym
    out = lut.tolist()
    if raw_key is not None:
        if len(_LUT_CACHE) > 64:           # bound memory on adversarial input
            _LUT_CACHE.clear()
        _LUT_CACHE[raw_key] = out
    return out


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


def _quantized_coeffs(arr: np.ndarray, quality: int):
    """Shared encoder front half: color transform, block DCT, quantize.
    Returns (planes_count, h, w, [(nblocks, 64) zigzag int32], [qt])."""
    if arr.ndim == 2:
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
    comp_zz = []
    for ci, plane in enumerate(planes):
        blocks, _, _ = _blockify(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", C, blocks, C)
        q = qts[min(ci, 1)].reshape(8, 8)
        comp_zz.append(np.round(coef / q).astype(np.int32)
                       .reshape(-1, 64)[:, ZIGZAG])
    return len(planes), h, w, comp_zz, qts


def _headers(h: int, w: int, nc: int, qts, sof: int, huffs,
             dri: int = 0) -> bytearray:
    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"                  # APP0
    for tid, qt in enumerate(qts):
        # DQT carries the table in zigzag order: segment[k] = Q[ZIGZAG[k]]
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid]) \
            + bytes(int(x) for x in qt[ZIGZAG])
    if dri:
        out += b"\xFF\xDD" + (4).to_bytes(2, "big") + dri.to_bytes(2, "big")
    out += bytes([0xFF, sof]) + (8 + 3 * nc).to_bytes(2, "big") + b"\x08" \
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, 1)])       # id, 1x1, qtable
    for tc, (bits, vals) in huffs:
        out += b"\xFF\xC4" + (19 + len(vals)).to_bytes(2, "big") \
            + bytes([tc]) + bytes(bits[1:]) + bytes(vals)
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 95,
                restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    baseline 4:4:4 JFIF JPEG.  ``restart_interval`` > 0 emits a DRI segment
    and an RSTn marker (with bit padding + DC-predictor reset) every that
    many MCUs — the fixture generator for the decoder's restart path."""
    nc, h, w, comp_zz, qts = _quantized_coeffs(arr, quality)
    planes = range(nc)

    dc_tabs = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_tabs = [_build_codes(*AC_LUMA), _build_codes(*AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * nc
    nblocks = comp_zz[0].shape[0]
    rst_n = 0
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
            pred = [0] * nc
        for ci in planes:
            t = min(ci, 1)
            zz = comp_zz[ci][bi]
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

    huffs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if nc > 1:
        huffs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    out = _headers(h, w, nc, qts, 0xC0, huffs, dri=restart_interval)
    out += b"\xFF\xDA" + (6 + 2 * nc).to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# -- progressive encoder -----------------------------------------------------------

#: a "flat" AC Huffman table for progressive scans: 255 symbols at 8 bits
#: (Kraft-complete minus one code).  Annex-K AC tables lack the EOBn
#: (n ≥ 1) symbols progressive EOB-run coding emits; a flat table keeps the
#: encoder table-driven without Huffman optimization passes.  Compression
#: suffers (~8 bits/symbol) — irrelevant for fixtures.
AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0],
           list(range(255)))


class _ProgState:
    """Per-scan EOB-run accumulator + buffered refinement bits."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.bits: list[int] = []


def _flush_eobrun(bw: _BitWriter, ac_tab, st: _ProgState) -> None:
    if st.eobrun > 0:
        n = st.eobrun.bit_length() - 1
        code, length = ac_tab[n << 4]
        bw.write(code, length)
        if n:
            bw.write(st.eobrun - (1 << n), n)
        st.eobrun = 0
    for b in st.bits:
        bw.write(b, 1)
    st.bits = []


def _rst(bw: _BitWriter, n: int) -> None:
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + (n & 7)])


def _enc_dc_scan(bw, comp_zz, dc_tabs, ah, al, ri: int = 0) -> None:
    nc = len(comp_zz)
    pred = [0] * nc
    rst_n = 0
    for bi in range(comp_zz[0].shape[0]):
        if ri and bi and bi % ri == 0:
            _rst(bw, rst_n)
            rst_n += 1
            pred = [0] * nc
        for ci in range(nc):
            v = int(comp_zz[ci][bi][0]) >> al   # DC point transform: >>
            if ah == 0:
                diff = v - pred[ci]
                pred[ci] = v
                size, bits = _magnitude(diff)
                code, length = dc_tabs[min(ci, 1)][size]
                bw.write(code, length)
                if size:
                    bw.write(bits, size)
            else:
                bw.write(v & 1, 1)              # refinement bit


def _enc_ac_first(bw, zz, ss, se, al, ac_tab, st: _ProgState) -> None:
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        t2 = abs(t) >> al                       # AC point transform: /2^al
        if t2 == 0:
            r += 1
            continue
        _flush_eobrun(bw, ac_tab, st)
        while r > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            r -= 16
        s = t2.bit_length()
        code, length = ac_tab[(r << 4) | s]
        bw.write(code, length)
        bw.write(t2 if t > 0 else (~t2) & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(bw, ac_tab, st)


def _enc_ac_refine(bw, zz, ss, se, al, ac_tab, st: _ProgState) -> None:
    """T.81 G.1.2.3 encode side (libjpeg-style correction-bit buffering)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br_bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            _flush_eobrun(bw, ac_tab, st)
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:                               # already significant
            br_bits.append(t & 1)
            continue
        _flush_eobrun(bw, ac_tab, st)           # newly significant
        code, length = ac_tab[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(zz[ss + i]) > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st.eobrun += 1
        st.bits.extend(br_bits)
        if st.eobrun == 0x7FFF or len(st.bits) > 900:
            _flush_eobrun(bw, ac_tab, st)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 95,
                            restart_interval: int = 0) -> bytes:
    """Encode as a progressive (SOF2) 4:4:4 JFIF JPEG with a libjpeg-style
    scan script: DC first (Al=1) → per-component AC first (Al=1) → DC
    refinement → per-component AC refinement, exercising spectral
    selection, successive approximation, EOB runs, and correction bits.
    ``restart_interval`` > 0 emits RSTn every that many MCUs in EVERY scan
    (EOB runs flushed at the boundary, per T.81)."""
    nc, h, w, comp_zz, qts = _quantized_coeffs(arr, quality)
    dc_tabs = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_flat = _build_codes(*AC_FLAT)

    huffs = [(0x00, DC_LUMA), (0x10, AC_FLAT)]
    if nc > 1:
        huffs += [(0x01, DC_CHROMA), (0x11, AC_FLAT)]
    out = _headers(h, w, nc, qts, 0xC2, huffs, dri=restart_interval)

    def sos(comps, ss, se, ah, al, entropy: bytes) -> None:
        ns = len(comps)
        seg = bytes([ns])
        for ci in comps:
            seg += bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)])
        seg += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xFF\xDA" + (2 + len(seg)).to_bytes(2, "big") + seg)
        out.extend(entropy)

    ri = restart_interval

    def ac_scan(ci, enc_fn, al):
        bw = _BitWriter()
        st = _ProgState()
        rst_n = 0
        for bi in range(comp_zz[ci].shape[0]):
            if ri and bi and bi % ri == 0:
                _flush_eobrun(bw, ac_flat, st)
                _rst(bw, rst_n)
                rst_n += 1
            enc_fn(bw, comp_zz[ci][bi], 1, 63, al, ac_flat, st)
        _flush_eobrun(bw, ac_flat, st)
        bw.flush()
        return bytes(bw.out)

    # scan 1: DC first, all components, Al=1
    bw = _BitWriter()
    _enc_dc_scan(bw, comp_zz, dc_tabs, ah=0, al=1, ri=ri)
    bw.flush()
    sos(list(range(nc)), 0, 0, 0, 1, bytes(bw.out))
    # scans 2..: AC first per component, Al=1
    for ci in range(nc):
        sos([ci], 1, 63, 0, 1, ac_scan(ci, _enc_ac_first, 1))
    # DC refinement, all components, Ah=1 → Al=0
    bw = _BitWriter()
    _enc_dc_scan(bw, comp_zz, dc_tabs, ah=1, al=0, ri=ri)
    bw.flush()
    sos(list(range(nc)), 0, 0, 1, 0, bytes(bw.out))
    # AC refinement per component, Ah=1 → Al=0
    for ci in range(nc):
        sos([ci], 1, 63, 1, 0, ac_scan(ci, _enc_ac_refine, 0))
    out += b"\xFF\xD9"                          # EOI
    return bytes(out)


# -- decoder ---------------------------------------------------------------------

class _BitReader:
    """Entropy-coded-segment reader.

    Stops feeding at ANY real marker (RSTn included) — the scan loop is the
    one that consumes restart markers via ``restart()``, which byte-aligns
    and drops buffered bits so the next MCU decodes from a clean boundary
    (ADVICE r2: skipping RSTs inline without a predictor reset silently
    corrupted every restart-interval image)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = (self.data[self.pos + 1]
                       if self.pos + 1 < len(self.data) else 0xD9)
                if nxt != 0x00:
                    return                 # real marker: stop here
                self.pos += 2              # stuffed 0xFF00 → literal 0xFF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:                 # past scan end: zero-pad
            self.acc <<= (n - self.nbits)
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, lut: list[int]) -> int:
        """One Huffman symbol via the 16-bit peek LUT (see _build_lut)."""
        self._fill()
        nb = self.nbits
        peek = ((self.acc >> (nb - 16)) & 0xFFFF) if nb >= 16 \
            else ((self.acc << (16 - nb)) & 0xFFFF)
        e = lut[peek]
        if e == 0:
            raise ValueError("invalid huffman code")
        ln = e >> 8
        if ln > nb:                        # zero-padded past scan end
            ln = nb
        self.nbits = nb - ln
        self.acc &= (1 << self.nbits) - 1
        return e & 0xFF

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, clear buffered bits."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF:
                nxt = self.data[self.pos + 1]
                if 0xD0 <= nxt <= 0xD7:
                    self.pos += 2
                    return
                if nxt != 0x00:
                    return                 # unexpected marker: scan ends
            self.pos += 1

    def scan_end(self) -> int:
        """Index just past this scan's entropy data (next non-RST marker)."""
        import re

        m = re.compile(b"\xff(?![\x00\xd0-\xd7])").search(self.data, self.pos)
        return m.start() if m else len(self.data)


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _refine_nonzero(br: "_BitReader", coef: np.ndarray, k: int, p1: int) -> None:
    """AC refinement correction bit for an already-nonzero coefficient
    (T.81 G.1.2.3: append one magnitude bit, toward ±infinity)."""
    if br.read(1) and not (abs(int(coef[k])) & p1):
        coef[k] += p1 if coef[k] > 0 else -p1


class _ScanState:
    def __init__(self, ncomp: int):
        self.pred = [0] * ncomp
        self.eobrun = 0

    def reset(self) -> None:
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _decode_block(br, coef, st, ci, scan, dc_tab, ac_tab, progressive):
    """Decode one block's contribution for the current scan into ``coef``
    (a length-64 int32 view in ZIGZAG order)."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if not progressive:
        size = br.huff(dc_tab)
        st.pred[ci] += _extend(br.read(size), size)
        coef[0] = st.pred[ci]
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
            coef[k] = _extend(br.read(size), size)
            k += 1
        return
    if ss == 0:                            # DC scan
        if ah == 0:                        # first pass
            size = br.huff(dc_tab)
            st.pred[ci] += _extend(br.read(size), size)
            coef[0] = st.pred[ci] << al
        else:                              # refinement: one bit per block
            if br.read(1):
                coef[0] = int(coef[0]) | (1 << al)
        return
    if ah == 0:                            # AC first pass (EOB-run coded)
        if st.eobrun > 0:
            st.eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = br.huff(ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:                # ZRL
                    k += 16
                    continue
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += br.read(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index out of range")
            coef[k] = _extend(br.read(s), s) << al
            k += 1
        return
    # AC refinement (T.81 G.1.2.3)
    p1 = 1 << al
    k = ss
    if st.eobrun == 0:
        while k <= se:
            sym = br.huff(ac_tab)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r != 15:                # EOBn: rest of band is refinement
                    st.eobrun = (1 << r)
                    if r:
                        st.eobrun += br.read(r)
                    break
                # r == 15 → ZRL: skip 16 zero-history coefficients
            else:
                val = p1 if br.read(1) else -p1
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(br, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if st.eobrun > 0:                      # refine the remaining nonzeros
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(br, coef, k, p1)
            k += 1
        st.eobrun -= 1


@malformed_input_guard('jpeg')
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to
    (h, w, 3) uint8 RGB (grayscale is broadcast to 3 channels for a uniform
    downstream shape).  Restart intervals are honored in both processes."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hluts: dict[int, list[int]] = {}
    hraw: dict[int, bytes] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    dri = 0
    coefs: list[np.ndarray] = []           # per-comp (bh, bw, 64) zigzag
    geom = None
    saw_scan = False
    while pos + 1 < len(payload):
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
                qtables[tid] = q.copy()    # keep zigzag order (coefs match)
                p += 1 + n
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc = seg[p]
                bits = [0] + list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htables[tc] = _build_decode(bits, vals)
                hraw[tc] = bytes(seg[p + 1:p + 17 + nv])
                hluts.pop(tc, None)        # DHT may redefine a table id
                p += 17 + nv
        elif marker == 0xDD:
            dri = int.from_bytes(seg[0:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            frame = {"h": h, "w": w, "comps": comps}
            geom = {"hmax": hmax, "vmax": vmax,
                    "mcus_x": mcus_x, "mcus_y": mcus_y}
            for c in comps:
                coefs.append(np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                "processes are supported")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(i for i, c in enumerate(frame["comps"])
                          if c["id"] == cs)
                scan_comps.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            scan = {"ss": ss, "se": se, "ah": a >> 4, "al": a & 0x0F,
                    "comps": scan_comps}
            br = _BitReader(payload, pos + seglen)
            scan_end = br.scan_end()
            for key, table in htables.items():
                if key not in hluts:
                    hluts[key] = _build_lut(table, hraw.get(key))
            if not progressive:
                segments = _split_entropy_segments(payload, pos + seglen,
                                                   scan_end)
                _fast_baseline_scan(segments, scan, frame, geom, coefs,
                                    hluts, dri)
            else:
                # progressive keeps the stateful reader; its Huffman reads
                # go through the same LUT
                _decode_scan(br, scan, frame, geom, coefs, hluts, dri,
                             progressive)
            saw_scan = True
            pos = scan_end
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("missing SOF/SOS segment")

    # dequantize + batched IDCT + assemble
    C = _dct_matrix()
    h, w = frame["h"], frame["w"]
    hmax, vmax = geom["hmax"], geom["vmax"]
    full = []
    for ci, c in enumerate(frame["comps"]):
        q = qtables[c["tq"]]               # zigzag order, like coefs
        bh, bw_, _ = coefs[ci].shape
        deq = (coefs[ci] * q)[:, :, UNZIGZAG].reshape(bh, bw_, 8, 8)
        pix = np.einsum("ij,xyjk,lk->xyil", C.T, deq.astype(np.float64), C.T)
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _split_entropy_segments(payload: bytes, start: int, end: int) -> list[bytes]:
    """Entropy data [start:end) split at RSTn markers, byte-unstuffed.

    Each returned segment decodes with a fresh bit phase and DC
    predictors (T.81 restart semantics); 0xFF00 stuffing collapses to a
    literal 0xFF so the hot loop never tests for markers."""
    import re

    raw = payload[start:end]
    return [s.replace(b"\xff\x00", b"\xff")
            for s in re.split(b"\xff[\xd0-\xd7]", raw)]


def _fast_baseline_scan(segments, scan, frame, geom, coefs, luts, dri):
    """Baseline sequential scan via the 16-bit Huffman LUT.

    All bit-reader state lives in local variables (acc/nbits/pos) and
    every Huffman symbol costs one list index + shift — ~20x the
    bit-by-bit dict walk.  Blocks decode into a plain Python list and
    land in the (nblocks, 64) coefficient array as one row assignment."""
    comps = frame["comps"]
    interleaved = len(scan["comps"]) > 1
    preds = [0] * len(comps)

    # flatten the block sequence: (comp_flat_array, block_row, dc_lut, ac_lut)
    flats = [coefs[ci].reshape(-1, coefs[ci].shape[2]) for ci in
             range(len(comps))]
    order: list[tuple] = []                 # one entry per block, MCU order
    restart_every = 0
    if interleaved:
        mcus_x, mcus_y = geom["mcus_x"], geom["mcus_y"]
        per_mcu = []
        for (ci, td, ta) in scan["comps"]:
            c = comps[ci]
            per_mcu.append((ci, c["h"], c["v"], luts[td], luts[0x10 | ta],
                            coefs[ci].shape[1]))
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, ch, cv, dlut, alut, bw_ in per_mcu:
                    for by in range(cv):
                        for bx in range(ch):
                            order.append((ci, (my * cv + by) * bw_
                                          + mx * ch + bx, dlut, alut))
        restart_every = dri * len(order) // (mcus_x * mcus_y) if dri else 0
    else:
        (ci, td, ta) = scan["comps"][0]
        c = comps[ci]
        cw = -(-frame["w"] * c["h"] // geom["hmax"])
        ch_ = -(-frame["h"] * c["v"] // geom["vmax"])
        nbw, nbh = -(-cw // 8), -(-ch_ // 8)
        bw_ = coefs[ci].shape[1]
        dlut, alut = luts[td], luts[0x10 | ta]
        for i in range(nbw * nbh):
            by, bx = divmod(i, nbw)
            order.append((ci, by * bw_ + bx, dlut, alut))
        restart_every = dri if dri else 0

    seg_i = 0
    data = segments[0]
    n = len(data)
    pos = 0
    acc = 0
    nbits = 0
    for bi, (ci, row, dlut, alut) in enumerate(order):
        if restart_every and bi and bi % restart_every == 0:
            seg_i += 1
            if seg_i < len(segments):
                data = segments[seg_i]
                n = len(data)
                pos = 0
                acc = 0
                nbits = 0
                preds = [0] * len(comps)
        blk = [0] * 64
        # -- DC --
        if nbits < 16:
            chunk = data[pos:pos + 24]
            if chunk:
                acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                nbits += 8 * len(chunk)
                pos += len(chunk)
        peek = ((acc >> (nbits - 16)) & 0xFFFF) if nbits >= 16 \
            else ((acc << (16 - nbits)) & 0xFFFF)
        e = dlut[peek]
        if e == 0:
            raise ValueError("invalid huffman code")
        ln = e >> 8
        s = e & 0xFF
        nbits -= ln
        if nbits < 0:
            nbits = 0
        acc &= (1 << nbits) - 1
        if s:
            if nbits < s:
                chunk = data[pos:pos + 24]
                if chunk:
                    acc = (acc << (8 * len(chunk))) \
                        | int.from_bytes(chunk, "big")
                    nbits += 8 * len(chunk)
                    pos += len(chunk)
                if nbits < s:               # truncated scan: zero-pad
                    acc <<= (s - nbits)
                    nbits = s
            v = (acc >> (nbits - s)) & ((1 << s) - 1)
            nbits -= s
            acc &= (1 << nbits) - 1
            preds[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        blk[0] = preds[ci]
        # -- AC --
        k = 1
        while k < 64:
            if nbits < 16:
                chunk = data[pos:pos + 24]
                if chunk:
                    acc = (acc << (8 * len(chunk))) \
                        | int.from_bytes(chunk, "big")
                    nbits += 8 * len(chunk)
                    pos += len(chunk)
            peek = ((acc >> (nbits - 16)) & 0xFFFF) if nbits >= 16 \
                else ((acc << (16 - nbits)) & 0xFFFF)
            e = alut[peek]
            if e == 0:
                raise ValueError("invalid huffman code")
            ln = e >> 8
            sym = e & 0xFF
            nbits -= ln
            if nbits < 0:
                nbits = 0
            acc &= (1 << nbits) - 1
            if sym == 0:
                break
            if sym == 0xF0:
                k += 16
                continue
            k += sym >> 4
            s = sym & 0x0F
            if k > 63:
                raise ValueError("AC index out of range")
            if nbits < s:
                chunk = data[pos:pos + 24]
                if chunk:
                    acc = (acc << (8 * len(chunk))) \
                        | int.from_bytes(chunk, "big")
                    nbits += 8 * len(chunk)
                    pos += len(chunk)
                if nbits < s:
                    acc <<= (s - nbits)
                    nbits = s
            v = (acc >> (nbits - s)) & ((1 << s) - 1)
            nbits -= s
            acc &= (1 << nbits) - 1
            blk[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            k += 1
        flats[ci][row] = blk


def _decode_scan(br, scan, frame, geom, coefs, htables, dri, progressive):
    comps = frame["comps"]
    st = _ScanState(len(comps))
    interleaved = len(scan["comps"]) > 1

    def tabs(td, ta):
        dc = htables.get(td)
        ac = htables.get(0x10 | ta)
        return dc, ac

    def maybe_restart(n_done, n_total):
        if dri and n_done % dri == 0 and n_done < n_total:
            br.restart()
            st.reset()

    if interleaved:
        mcus_x, mcus_y = geom["mcus_x"], geom["mcus_y"]
        total = mcus_x * mcus_y
        n = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for (ci, td, ta) in scan["comps"]:
                    c = comps[ci]
                    dc_tab, ac_tab = tabs(td, ta)
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = coefs[ci][my * c["v"] + by,
                                             mx * c["h"] + bx]
                            _decode_block(br, coef, st, ci, scan,
                                          dc_tab, ac_tab, progressive)
                n += 1
                maybe_restart(n, total)
        return
    (ci, td, ta) = scan["comps"][0]
    c = comps[ci]
    # non-interleaved geometry: ceil of the COMPONENT dimensions, not the
    # MCU-padded grid (T.81 A.2.2)
    cw = -(-frame["w"] * c["h"] // geom["hmax"])
    ch = -(-frame["h"] * c["v"] // geom["vmax"])
    nbw, nbh = -(-cw // 8), -(-ch // 8)
    dc_tab, ac_tab = tabs(td, ta)
    total = nbw * nbh
    for i in range(total):
        by, bx = divmod(i, nbw)
        _decode_block(br, coefs[ci][by, bx], st, ci, scan,
                      dc_tab, ac_tab, progressive)
        maybe_restart(i + 1, total)


def psnr_jpeg_roundtrip(arr: np.ndarray, quality: int = 95) -> float:
    """Round-trip PSNR helper (test/diagnostic use)."""
    from .png import psnr

    return psnr(decode_jpeg(encode_jpeg(arr, quality)), arr)
