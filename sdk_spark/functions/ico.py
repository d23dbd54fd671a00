"""ICO container codec (pure Python/numpy).

Windows icon files are a directory of sub-images, each either a PNG
stream (Vista+) or a headerless DIB (the BMP pixel format with the
height field doubled to cover the XOR colour plane + AND transparency
mask).  Both sub-formats decode through the engine's own PNG/BMP
codecs — this module is container logic only, which is exactly how the
real-world format works.

ICO has no magic string; ``looks_like_ico`` applies the standard
structural sniff (reserved==0, type 1/2, plausible directory) used by
file(1) and browsers.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard


def looks_like_ico(payload: bytes) -> bool:
    if len(payload) < 6 + 16:
        return False
    if payload[0:2] != b"\x00\x00" or payload[2:4] not in (b"\x01\x00",
                                                           b"\x02\x00"):
        return False
    count = int.from_bytes(payload[4:6], "little")
    if not 1 <= count <= 64:
        return False
    if len(payload) < 6 + 16 * count:
        return False
    # every directory entry must point inside the payload
    for i in range(count):
        e = payload[6 + 16 * i:6 + 16 * (i + 1)]
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        if off < 6 + 16 * count or off + size > len(payload) or size < 16:
            return False
    return True


def ico_entries(payload: bytes) -> list[dict]:
    """Parse the ICONDIR: one dict per sub-image (w, h, bpp, png, size,
    offset).  Width/height bytes of 0 mean 256."""
    if not looks_like_ico(payload):
        raise ValueError("not an ICO payload")
    count = int.from_bytes(payload[4:6], "little")
    out = []
    for i in range(count):
        e = payload[6 + 16 * i:6 + 16 * (i + 1)]
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        body = payload[off:off + size]
        out.append({
            "w": e[0] or 256, "h": e[1] or 256,
            "bpp": int.from_bytes(e[6:8], "little"),
            "png": body[:8] == b"\x89PNG\r\n\x1a\n",
            "size": size, "offset": off,
        })
    return out


def _decode_dib_entry(body: bytes, return_alpha: bool) -> np.ndarray:
    """Headerless-DIB sub-image: halve the doubled height, wrap in a BMP
    file header, and feed the engine's BMP decoder; the AND mask (after
    the XOR plane) becomes the alpha channel for < 32 bpp entries."""
    from .bmp import decode_bmp

    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size = int.from_bytes(body[0:4], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    w = int.from_bytes(body[4:8], "little", signed=True)
    h2 = int.from_bytes(body[8:12], "little", signed=True)
    bpp = int.from_bytes(body[14:16], "little")
    comp = int.from_bytes(body[16:20], "little")
    clr_used = int.from_bytes(body[32:36], "little")
    h = h2 // 2 if h2 > 0 else -(-h2 // 2)
    patched = bytearray(body)
    # h already carries h2's sign (negative = top-down); writing -h here
    # would silently drop the top-down flag and flip the image
    patched[8:12] = int(h).to_bytes(4, "little", signed=True)
    palette = (clr_used or (1 << bpp if bpp <= 8 else 0)) * 4
    masks = 12 if (comp == 3 and hdr_size == 40) else 0
    pix_off = 14 + hdr_size + palette + masks
    fh = b"BM" + (14 + len(patched)).to_bytes(4, "little") + b"\x00" * 4 \
        + pix_off.to_bytes(4, "little")
    rgb = decode_bmp(fh + bytes(patched),
                     return_alpha=(return_alpha and bpp == 32))
    if not return_alpha or bpp == 32:
        return rgb
    # AND mask: 1-bpp rows (padded to 32 bits) after the XOR plane
    xor_row = (abs(w) * bpp + 31) // 32 * 4
    mask_off = pix_off - 14 + abs(h) * xor_row
    mask_row = (abs(w) + 31) // 32 * 4
    mask = np.zeros((abs(h), abs(w)), dtype=np.uint8)
    for r in range(abs(h)):
        row = body[mask_off + r * mask_row: mask_off + (r + 1) * mask_row]
        if len(row) < mask_row:
            break                       # mask absent: fully opaque
        bits = np.unpackbits(np.frombuffer(row, dtype=np.uint8))[:abs(w)]
        tgt = abs(h) - 1 - r if h2 > 0 else r
        mask[tgt] = bits
    alpha = np.where(mask == 0, 255, 0).astype(np.uint8)
    return np.dstack([rgb, alpha])


@malformed_input_guard('ico')
def decode_ico(payload: bytes, index: int | None = None,
               return_alpha: bool = False) -> np.ndarray:
    """Decode one ICO sub-image to (h, w, 3) RGB (or RGBA).

    ``index=None`` picks the best entry: largest area, then deepest bpp —
    the same selection rule browsers and file managers apply."""
    entries = ico_entries(payload)
    if index is None:
        index = max(range(len(entries)),
                    key=lambda i: (entries[i]["w"] * entries[i]["h"],
                                   entries[i]["bpp"]))
    if not 0 <= index < len(entries):
        raise ValueError(f"ICO entry {index} out of range")
    e = entries[index]
    body = payload[e["offset"]:e["offset"] + e["size"]]
    if e["png"]:
        from .png import decode_png

        return decode_png(body, return_alpha=return_alpha)
    return _decode_dib_entry(body, return_alpha)


def encode_ico(images: "np.ndarray | list[np.ndarray]") -> bytes:
    """Encode one or more RGB(A) arrays as a PNG-entry ICO (Vista+ form;
    every sub-image ≤ 256×256)."""
    from .png import encode_png

    if isinstance(images, np.ndarray):
        images = [images]
    if not images:
        raise ValueError("encode_ico needs at least one image")
    if len(images) > 64:
        raise ValueError("ICO directories are capped at 64 entries "
                         "(the structural-sniff bound decode applies)")
    blobs = []
    for arr in images:
        h, w = arr.shape[:2]
        if w > 256 or h > 256:
            raise ValueError(f"ICO sub-images are capped at 256x256, "
                             f"got {w}x{h}")
        rgb = arr[..., :3] if arr.ndim == 3 else \
            np.dstack([arr] * 3).astype(np.uint8)
        blobs.append((w, h, encode_png(np.ascontiguousarray(rgb))))
    out = bytearray()
    out += b"\x00\x00\x01\x00" + len(blobs).to_bytes(2, "little")
    off = 6 + 16 * len(blobs)
    for w, h, blob in blobs:
        out += bytes([w % 256, h % 256, 0, 0])
        out += (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        out += len(blob).to_bytes(4, "little") + off.to_bytes(4, "little")
        off += len(blob)
    for _w, _h, blob in blobs:
        out += blob
    return bytes(out)
