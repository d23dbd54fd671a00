"""EXIF metadata: TIFF-IFD parser, JPEG/WebP extraction, orientation.

Real crawl JPEGs routinely carry camera orientation in APP1/Exif; a
validator that ignores it reports false dimension mismatches on every
rotated photo (a 3024x4032 portrait shot whose pixels are stored
4032x3024).  This module parses the EXIF TIFF structure (both byte
orders, IFD0 + Exif sub-IFD), exposes the fields the validation tier
needs (Orientation 0x0112, PixelXDimension 0xA002 / PixelYDimension
0xA003, plus IFD0 ImageWidth/ImageLength), applies the 8 orientation
transforms, and builds APP1 segments for fixtures.

Pure function of the payload bytes — safe inside Arrow batch kernels.

Reference parity note: the json-structure reference SDK has no media
metadata handling; this supports the engine's multimodal tier.
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

ORIENTATION = 0x0112
IMAGE_WIDTH = 0x0100
IMAGE_LENGTH = 0x0101
EXIF_IFD_POINTER = 0x8769
PIXEL_X_DIMENSION = 0xA002
PIXEL_Y_DIMENSION = 0xA003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(data: bytes, pos: int, bo: str, out: dict) -> None:
    """One IFD's scalar SHORT/LONG entries into ``out`` (tag -> int)."""
    if pos + 2 > len(data):
        raise ValueError("truncated EXIF IFD")
    n = int.from_bytes(data[pos:pos + 2], bo)
    pos += 2
    if pos + 12 * n > len(data):
        raise ValueError("truncated EXIF IFD entries")
    for i in range(n):
        e = pos + 12 * i
        tag = int.from_bytes(data[e:e + 2], bo)
        typ = int.from_bytes(data[e + 2:e + 4], bo)
        cnt = int.from_bytes(data[e + 4:e + 8], bo)
        if typ not in (3, 4) or cnt != 1:
            continue                       # only scalar SHORT/LONG needed
        width = _TYPE_SIZES[typ] * cnt
        raw = data[e + 8:e + 8 + (width if width <= 4 else 0)]
        if width <= 4:
            out[tag] = int.from_bytes(raw[:width], bo)
        else:                              # pragma: no cover - cnt==1 fits
            off = int.from_bytes(data[e + 8:e + 12], bo)
            out[tag] = int.from_bytes(data[off:off + width], bo)


@malformed_input_guard('exif')
def parse_tiff_exif(data: bytes) -> dict:
    """TIFF-structured EXIF block -> {orientation, exif_w, exif_h, ...}."""
    if data[:2] == b"II":
        bo = "little"
    elif data[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("EXIF: bad TIFF byte-order mark")
    if int.from_bytes(data[2:4], bo) != 42:
        raise ValueError("EXIF: bad TIFF magic")
    ifd0_off = int.from_bytes(data[4:8], bo)
    tags: dict[int, int] = {}
    _read_ifd(data, ifd0_off, bo, tags)
    if EXIF_IFD_POINTER in tags:
        try:
            _read_ifd(data, tags[EXIF_IFD_POINTER], bo, tags)
        except ValueError:
            pass                           # sub-IFD truncated: keep IFD0
    return {
        "orientation": tags.get(ORIENTATION, 1),
        "exif_w": tags.get(PIXEL_X_DIMENSION, tags.get(IMAGE_WIDTH)),
        "exif_h": tags.get(PIXEL_Y_DIMENSION, tags.get(IMAGE_LENGTH)),
    }


@malformed_input_guard('exif')
def extract_exif(payload: bytes) -> dict | None:
    """EXIF dict from a JPEG (APP1) or WebP (EXIF chunk) payload, or None."""
    if payload[:2] == b"\xFF\xD8":         # JPEG: scan APP1 segments
        pos = 2
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9 or marker == 0xDA:
                break                      # EOI / entropy data: no EXIF
            seg_len = int.from_bytes(payload[pos + 2:pos + 4], "big")
            body = payload[pos + 4:pos + 2 + seg_len]
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                return parse_tiff_exif(body[6:])
            pos += 2 + seg_len
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(payload):
            tag = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if tag == b"EXIF":
                body = payload[pos + 8:pos + 8 + size]
                if body[:6] == b"Exif\x00\x00":   # optional prefix
                    body = body[6:]
                return parse_tiff_exif(body)
            pos += 8 + size + (size & 1)
    return None


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """EXIF orientations 1-8 -> upright pixels (TIFF 6.0 definitions)."""
    if orientation in (0, 1):
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return np.swapaxes(arr, 0, 1)
    if orientation == 6:                   # rotate 90 CW to display
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if orientation == 8:                   # rotate 90 CCW to display
        return np.swapaxes(arr, 0, 1)[::-1, :]
    raise ValueError(f"EXIF orientation out of range: {orientation}")


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------


def build_exif_tiff(orientation: int = 1, exif_w: int | None = None,
                    exif_h: int | None = None, byte_order: str = "little",
                    ) -> bytes:
    """Minimal valid TIFF-EXIF block (IFD0 orientation + Exif sub-IFD dims)."""
    bo = byte_order
    mark = b"II" if bo == "little" else b"MM"

    def ent(tag: int, typ: int, val: int) -> bytes:
        width = _TYPE_SIZES[typ]
        return (tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + (1).to_bytes(4, bo)
                + val.to_bytes(width, bo).ljust(4, b"\x00"))

    sub_entries = b""
    n_sub = 0
    if exif_w is not None:
        sub_entries += ent(PIXEL_X_DIMENSION, 4, exif_w)
        n_sub += 1
    if exif_h is not None:
        sub_entries += ent(PIXEL_Y_DIMENSION, 4, exif_h)
        n_sub += 1

    ifd0_count = 1 + (1 if n_sub else 0)
    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * ifd0_count + 4
    ifd0 = ifd0_count.to_bytes(2, bo) + ent(ORIENTATION, 3, orientation)
    if n_sub:
        ifd0 += ent(EXIF_IFD_POINTER, 4, sub_off)
    ifd0 += (0).to_bytes(4, bo)            # next-IFD pointer
    sub = (n_sub.to_bytes(2, bo) + sub_entries + (0).to_bytes(4, bo)) \
        if n_sub else b""
    return mark + (42).to_bytes(2, bo) + ifd0_off.to_bytes(4, bo) + ifd0 + sub


def inject_jpeg_exif(jpeg: bytes, tiff: bytes) -> bytes:
    """Insert an APP1/Exif segment right after SOI."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    body = b"Exif\x00\x00" + tiff
    seg = b"\xFF\xE1" + (len(body) + 2).to_bytes(2, "big") + body
    return jpeg[:2] + seg + jpeg[2:]


def inject_webp_exif(webp: bytes, tiff: bytes) -> bytes:
    """Append an EXIF chunk to a RIFF/WEBP container."""
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    body = b"Exif\x00\x00" + tiff
    chunk = b"EXIF" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    out = webp + chunk
    return out[:4] + (len(out) - 8).to_bytes(4, "little") + out[8:]
