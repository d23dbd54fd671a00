"""QOI ("Quite OK Image") codec, pure Python/numpy.

Implements the complete public specification (qoiformat.org, one page):
header ``qoif`` + BE dims, then a byte stream of six chunk ops — RGB,
RGBA, INDEX (64-slot running hash table, hash = (3r+5g+7b+11a) mod 64),
DIFF (2-bit channel deltas), LUMA (6-bit green delta + 4-bit red/blue
deltas relative to it), RUN (1..62) — terminated by seven 0x00 and one
0x01.  Both directions are exact: QOI is lossless by design, so the
round trip is bit-identical pixels.

The stream is inherently sequential (every op depends on the previous
pixel and the running table), so decode is a per-byte Python loop — fine
for the fixture sizes the validation tier plants; the heavyweight crawl
formats (JPEG/WebP/GIF) have the vectorized LUT decoders.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(arr: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode (h, w, 3|4) uint8 pixels as QOI."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_qoi expects (h, w, 3|4) uint8")
    h, w, ch = arr.shape
    out = bytearray()
    out += _MAGIC
    out += int(w).to_bytes(4, "big") + int(h).to_bytes(4, "big")
    out += bytes([ch, colorspace])

    table = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = arr.reshape(-1, ch)
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        a = int(px[3]) if ch == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash(r, g, b, a)
        if table[idx] == (r, g, b, a):
            out.append(idx)
        else:
            table[idx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 256) % 256
                dg = (g - pg + 256) % 256
                db = (b - pb + 256) % 256
                # map to signed
                sdr = dr - 256 if dr > 127 else dr
                sdg = dg - 256 if dg > 127 else dg
                sdb = db - 256 if db > 127 else db
                if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                    out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2)
                               | (sdb + 2))
                elif -32 <= sdg <= 31 and -8 <= sdr - sdg <= 7 \
                        and -8 <= sdb - sdg <= 7:
                    out.append(0x80 | (sdg + 32))
                    out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
                else:
                    out += bytes([0xFE, r, g, b])
            else:
                out += bytes([0xFF, r, g, b, a])
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


@malformed_input_guard('qoi')
def decode_qoi(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode QOI to (h, w, 3) uint8 RGB (or RGBA with ``return_alpha``)."""
    if payload[:4] != _MAGIC or len(payload) < 14 + len(_END):
        raise ValueError("not a QOI payload")
    w = int.from_bytes(payload[4:8], "big")
    h = int.from_bytes(payload[8:12], "big")
    ch = payload[12]
    if ch not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {ch}")
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("QOI dimensions out of range")
    n = w * h
    px = np.zeros((n, 4), dtype=np.uint8)
    table = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(payload) - len(_END)
    data = payload
    while i < n:
        if pos >= end:
            raise ValueError("QOI stream truncated before all pixels")
        byte = data[pos]
        pos += 1
        # operand bytes are bounds-checked against the end marker too:
        # a chunk whose operands are truncated must raise, not silently
        # consume the 0x00 end-marker bytes as pixel data
        if byte == 0xFE:                      # RGB
            if pos + 3 > end:
                raise ValueError("QOI RGB chunk truncated")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:                    # RGBA
            if pos + 4 > end:
                raise ValueError("QOI RGBA chunk truncated")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:                      # INDEX
                r, g, b, a = table[byte & 0x3F]
            elif tag == 1:                    # DIFF
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:                    # LUMA
                dg = (byte & 0x3F) - 32
                if pos + 1 > end:
                    raise ValueError("QOI LUMA chunk truncated")
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0xF) - 8) % 256
            else:                             # RUN
                run = (byte & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows pixel count")
                px[i:i + run] = (r, g, b, a)
                i += run
                continue
        table[_hash(r, g, b, a)] = (r, g, b, a)
        px[i] = (r, g, b, a)
        i += 1
    if data[end:end + len(_END)] != _END:
        raise ValueError("QOI end marker missing")
    img = px.reshape(h, w, 4)
    return img if return_alpha else img[..., :3].copy()
