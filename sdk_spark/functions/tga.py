"""TGA (Targa) codec: truecolor raw + RLE, both row orders.

The Targa format survives everywhere game/graphics toolchains touch
training data.  Decode covers image types 2 (uncompressed truecolor) and
10 (RLE truecolor) at 24/32 bpp, honoring the image-descriptor origin
bit (bottom-up default, top-down bit 5) and skipping the identification
field; encode writes type 10 RLE, top-down, 24 bpp (or 32 with alpha).
TGA has no magic number: ``looks_like_tga`` applies the standard header
plausibility sniff (color-map/type/bpp/descriptor consistency).
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard


def looks_like_tga(payload: bytes) -> bool:
    if len(payload) < 18:
        return False
    cmap_type, img_type = payload[1], payload[2]
    if cmap_type not in (0, 1) or img_type not in (2, 10):
        return False
    if cmap_type == 0 and payload[3:8] != b"\x00" * 5:
        return False
    w = int.from_bytes(payload[12:14], "little")
    h = int.from_bytes(payload[14:16], "little")
    bpp = payload[16]
    if bpp not in (24, 32) or w == 0 or h == 0 or w * h > (1 << 26):
        return False
    if payload[17] & 0xC0:                 # interleave bits must be 0
        return False
    return True


@malformed_input_guard('tga')
def decode_tga(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    if not looks_like_tga(payload):
        raise ValueError("not a TGA payload (types 2/10, 24/32 bpp)")
    id_len, _cmap, img_type = payload[0], payload[1], payload[2]
    w = int.from_bytes(payload[12:14], "little")
    h = int.from_bytes(payload[14:16], "little")
    bpp = payload[16]
    top_down = bool(payload[17] & 0x20)
    nch = bpp // 8
    pos = 18 + id_len
    need = w * h * nch
    if img_type == 2:
        data = payload[pos:pos + need]
        if len(data) < need:
            raise ValueError("TGA pixel data truncated")
        px = np.frombuffer(data, dtype=np.uint8).reshape(-1, nch)
    else:                                  # type 10: RLE packets
        out = np.empty((w * h, nch), dtype=np.uint8)
        i = 0
        n = len(payload)
        while i < w * h:
            if pos >= n:
                raise ValueError("TGA RLE stream truncated")
            hdr = payload[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if i + count > w * h:
                raise ValueError("TGA RLE packet overflows image")
            if hdr & 0x80:                 # run packet: one pixel repeated
                px1 = payload[pos:pos + nch]
                if len(px1) < nch:
                    raise ValueError("TGA RLE run truncated")
                out[i:i + count] = np.frombuffer(px1, dtype=np.uint8)
                pos += nch
            else:                          # raw packet
                chunk = payload[pos:pos + count * nch]
                if len(chunk) < count * nch:
                    raise ValueError("TGA RLE raw packet truncated")
                out[i:i + count] = np.frombuffer(chunk, dtype=np.uint8) \
                    .reshape(count, nch)
                pos += count * nch
            i += count
        px = out
    img = px.reshape(h, w, nch)
    if not top_down:
        img = img[::-1]
    rgb = img[..., :3][..., ::-1]          # BGR(A) storage
    if return_alpha:
        alpha = img[..., 3] if nch == 4 else \
            np.full((h, w), 255, np.uint8)
        return np.dstack([rgb, alpha]).copy()
    return np.ascontiguousarray(rgb)


def encode_tga(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3|4) uint8 as RLE truecolor, top-down."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_tga expects (h, w, 3|4) uint8")
    h, w, nch = arr.shape
    bgr = arr.copy()
    bgr[..., :3] = arr[..., :3][..., ::-1]
    head = bytearray(18)
    head[2] = 10                           # RLE truecolor
    head[12:14] = w.to_bytes(2, "little")
    head[14:16] = h.to_bytes(2, "little")
    head[16] = nch * 8
    head[17] = 0x20 | (8 if nch == 4 else 0)   # top-down, alpha bits
    out = bytearray(head)
    flat = bgr.reshape(-1, nch)
    i = 0
    total = len(flat)
    while i < total:
        # row-independent runs are legal in TGA (packets may cross rows)
        run = 1
        while run < 128 and i + run < total and \
                (flat[i + run] == flat[i]).all():
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out += flat[i].tobytes()
            i += run
        else:
            start = i
            i += 1
            while i < total and (i - start) < 128 and \
                    not (i + 1 < total and (flat[i] == flat[i + 1]).all()):
                i += 1
            count = i - start
            out.append(count - 1)
            out += flat[start:i].tobytes()
    return bytes(out)
