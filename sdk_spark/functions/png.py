"""Pure-Python PNG codec (no PIL in this environment).

Encoder: 8-bit RGB (filter-0 scanlines) — the engine's synthetic-fixture
writer.  Decoder: the full baseline PNG feature set a crawl actually
contains — color types 0 (gray), 2 (RGB), 3 (palette + tRNS), 4
(gray+alpha), 6 (RGBA); bit depths 1/2/4/8/16; all five scanline
filters; Adam7 interlacing.  Validated against real libpng output
(via the system libgd) in tests/test_png_full.py: truecolor, palette
(1/2/4/8-bit), alpha and interlaced fixtures decode byte-identically.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codec_util import malformed_input_guard

_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass offsets/strides: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as an RGB8 PNG."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 array")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def _unfilter(raw: bytes, pos: int, w: int, h: int, bpp: int,
              stride: int) -> tuple[np.ndarray, int]:
    """Reverse scanline filters for one (sub)image; returns (rows, pos)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:    # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif ftype == 2:    # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:    # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) \
                    & 0xFF
        elif ftype == 4:    # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = line
        prev = out[y]
    return out, pos


def _unpack_samples(rows: np.ndarray, w: int, channels: int,
                    depth: int) -> np.ndarray:
    """Byte rows -> (h, w, channels) uint8 samples (depth-scaled)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * channels].reshape(h, w, channels)
    if depth == 16:
        # take the high byte (PNG stores big-endian 16-bit samples)
        return rows.reshape(h, -1)[:, :w * channels * 2:2] \
            .reshape(h, w, channels)
    # sub-byte depths: only legal for 1-channel types (gray / palette)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    bits = np.empty((h, rows.shape[1] * per_byte), dtype=np.uint8)
    for k in range(per_byte):
        shift = 8 - depth * (k + 1)     # MSB-first packing
        bits[:, k::per_byte] = (rows >> shift) & mask
    return bits[:, :w].reshape(h, w, 1)


def _scale_depth(samples: np.ndarray, depth: int) -> np.ndarray:
    """Scale sub-byte gray samples to 8-bit (palette indices excluded)."""
    if depth == 1:
        return samples * 255
    if depth == 2:
        return samples * 85
    if depth == 4:
        return samples * 17
    return samples


@malformed_input_guard('png')
def decode_png(data: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode a PNG into (H, W, 3) uint8 RGB (or RGBA with
    ``return_alpha``)."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    depth = ctype = interlace = 0
    palette = None
    trns = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body[:13])
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"bad PNG bit depth {depth}")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(idat)

    def stride_for(width: int) -> int:
        return (width * channels * depth + 7) // 8

    bpp = max(1, channels * depth // 8)
    samples = np.zeros((h, w, channels), dtype=np.uint8)
    if interlace == 0:
        rows, _ = _unfilter(raw, 0, w, h, bpp, stride_for(w))
        samples = _unpack_samples(rows, w, channels, depth)
    elif interlace == 1:                 # Adam7
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rows, p = _unfilter(raw, p, pw, ph, bpp, stride_for(pw))
            sub = _unpack_samples(rows, pw, channels, depth)
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"bad interlace method {interlace}")

    if ctype == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = np.minimum(samples[..., 0], len(palette) - 1)
        rgb = palette[idx]
        if return_alpha:
            if trns is not None:
                at = np.full(len(palette), 255, dtype=np.uint8)
                at[:len(trns)] = trns
                a = at[idx]
            else:
                a = np.full((h, w), 255, dtype=np.uint8)
            return np.dstack([rgb, a])
        return rgb
    samples = _scale_depth(samples, depth)
    if ctype == 0:
        rgb = np.repeat(samples, 3, axis=2)
        a = None
    elif ctype == 2:
        rgb = samples
        a = None
    elif ctype == 4:
        rgb = np.repeat(samples[..., :1], 3, axis=2)
        a = samples[..., 1]
    else:                                # 6: RGBA
        rgb = samples[..., :3]
        a = samples[..., 3]
    if return_alpha:
        if a is None:
            a = np.full((h, w), 255, dtype=np.uint8)
        return np.dstack([rgb, a])
    return rgb


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
