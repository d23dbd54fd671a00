"""BMP (Windows DIB) codec in pure Python/numpy.

Decoder: BITMAPINFOHEADER and the V4/V5 extensions; 1/4/8-bit palette,
16-bit (BI_BITFIELDS masks or the 555 default), 24-bit BGR, 32-bit
BGR(A/X); BI_RGB, BI_RLE8, BI_RLE4 and BI_BITFIELDS compressions;
bottom-up and top-down row order; 4-byte row padding.

Encoder: 24-bit BI_RGB (the universal interchange form) for fixtures
and re-encode sinks.

Conformance: tests/test_bmp_tiff.py cross-validates against the system
libgd (gdImageBmpPtr / gdImageCreateFromBmpPtr) in both directions.

Reference parity note: the json-structure reference SDK contains no
image codecs; this module serves the engine's multimodal decode-breadth
tier (fail-closed via codec_util, like every other format).
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard


def _mask_shift(mask: int) -> tuple[int, int]:
    """(right-shift, bit-count) to normalize a packed channel to 8 bits."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    bits = (mask >> shift).bit_length()
    return shift, bits


def _expand_channel(vals: np.ndarray, mask: int) -> np.ndarray:
    shift, bits = _mask_shift(mask)
    if bits == 0:
        return np.full(vals.shape, 255, dtype=np.uint8)
    chan = (vals >> shift) & ((1 << bits) - 1)
    # scale to 0..255 (e.g. 5 bits: v*255/31)
    return np.round(chan.astype(np.float64) * 255.0 /
                    ((1 << bits) - 1)).astype(np.uint8)


def _decode_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indices (bottom-up order)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:                       # encoded run
            if four_bit:
                pair = [(val >> 4) & 0xF, val & 0xF]
                run = [pair[i % 2] for i in range(count)]
            else:
                run = [val] * count
            end = min(x + count, w)
            if y < h:
                out[y, x:end] = run[:end - x]
            x += count
        elif val == 0:                      # end of line
            x, y = 0, y + 1
        elif val == 1:                      # end of bitmap
            break
        elif val == 2:                      # delta
            if pos + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:                               # absolute mode: `val` pixels
            cnt = val
            if four_bit:
                nbytes = (cnt + 1) // 2
                chunk = data[pos:pos + nbytes]
                if len(chunk) < nbytes:
                    raise ValueError("truncated BMP RLE absolute run")
                vals = []
                for b in chunk:
                    vals += [(b >> 4) & 0xF, b & 0xF]
                vals = vals[:cnt]
                pos += nbytes + (nbytes & 1)    # word-aligned
            else:
                vals = list(data[pos:pos + cnt])
                if len(vals) < cnt:
                    raise ValueError("truncated BMP RLE absolute run")
                pos += cnt + (cnt & 1)
            end = min(x + cnt, w)
            if y < h:
                out[y, x:end] = vals[:end - x]
            x += cnt
    return out[::-1]                        # RLE bitmaps are bottom-up


@malformed_input_guard("bmp")
def decode_bmp(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode a BMP to (h, w, 3) uint8 RGB (or RGBA with ``return_alpha``)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM signature)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    pix_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} "
                         "(OS/2 BITMAPCOREHEADER)")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    clr_used = int.from_bytes(payload[46:50], "little")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("BMP dimensions out of range")
    if planes != 1:
        raise ValueError("BMP planes must be 1")

    if comp == 3 and bpp in (16, 32):       # BI_BITFIELDS
        # masks sit at absolute offset 54 in every header variant: inline
        # extra masks after a 40-byte INFOHEADER, or the bV4/bV5 mask
        # fields of the larger headers (which start at the same position)
        rm = int.from_bytes(payload[54:58], "little")
        gm = int.from_bytes(payload[58:62], "little")
        bm_ = int.from_bytes(payload[62:66], "little")
        am = int.from_bytes(payload[66:70], "little") if hdr_size > 40 else 0
    elif bpp == 16:
        rm, gm, bm_, am = 0x7C00, 0x03E0, 0x001F, 0
    elif bpp == 32:
        rm, gm, bm_, am = 0xFF0000, 0x00FF00, 0x0000FF, 0
    else:
        rm = gm = bm_ = am = 0
    if comp not in (0, 1, 2, 3):
        raise ValueError(f"unsupported BMP compression {comp}")

    # palette (BGRX quads) sits after header (+ inline masks for hdr 40)
    pal_off = 14 + hdr_size + (12 if comp == 3 and hdr_size == 40 else 0)
    palette = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        quads = np.frombuffer(
            payload[pal_off:pal_off + 4 * n_colors], dtype=np.uint8)
        if quads.size < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        palette = quads.reshape(n_colors, 4)[:, [2, 1, 0]].copy()

    if comp in (1, 2):                      # RLE8 / RLE4
        if (comp == 1) != (bpp == 8) or (comp == 2) != (bpp == 4):
            raise ValueError("BMP RLE compression/bpp mismatch")
        idx = _decode_rle(payload[pix_off:], w, h, four_bit=(comp == 2))
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index outside palette")
        rgb = palette[idx]
        return np.dstack([rgb, np.full((h, w), 255, np.uint8)]) \
            if return_alpha else rgb

    row_bytes = (w * bpp + 31) // 32 * 4
    need = row_bytes * h
    raw = payload[pix_off:pix_off + need]
    if len(raw) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]

    alpha = np.full((h, w), 255, dtype=np.uint8)
    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)
        rgb = px[:, :, ::-1].copy()
    elif bpp == 32:
        px = rows[:, :w * 4].reshape(h, w, 4)
        vals = px.view(np.uint32).reshape(h, w) if px.flags["C_CONTIGUOUS"] \
            else np.ascontiguousarray(px).view(np.uint32).reshape(h, w)
        rgb = np.dstack([_expand_channel(vals, rm),
                         _expand_channel(vals, gm),
                         _expand_channel(vals, bm_)])
        if am:
            alpha = _expand_channel(vals, am)
    elif bpp == 16:
        vals = rows[:, :w * 2].copy().view(np.uint16).reshape(h, w) \
            .astype(np.uint32)
        rgb = np.dstack([_expand_channel(vals, rm),
                         _expand_channel(vals, gm),
                         _expand_channel(vals, bm_)])
        if am:
            alpha = _expand_channel(vals, am)
    elif bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0xF
            inter = np.empty((h, row_bytes * 2), dtype=np.uint8)
            inter[:, 0::2] = hi
            inter[:, 1::2] = lo
            idx = inter[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index outside palette")
        rgb = palette[idx]
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return np.dstack([rgb, alpha]) if return_alpha else rgb


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit BI_RGB bottom-up BMP."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pix = body.tobytes()
    info = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
            + len(pix).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2     # 72 DPI
            + (0).to_bytes(4, "little") * 2)
    off = 14 + 40
    head = (b"BM" + (off + len(pix)).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + off.to_bytes(4, "little"))
    return head + info + pix
