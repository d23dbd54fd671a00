"""ctypes bindings to the system libgd — reference PNG producer for tests.

libgd writes PNGs through the real libpng, giving externally-produced
fixtures across color types (truecolor 2, palette 3 at depths 1/2/4/8,
RGBA 6), Adam7 interlacing, and libpng's own filter choices.  Gated on
library presence like tests/libwebp_ref.py.
"""
from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

try:
    _name = ctypes.util.find_library("gd") or "libgd.so.3"
    gd = ctypes.CDLL(_name)
    gd.gdImageCreateTrueColor.restype = ctypes.c_void_p
    gd.gdImageCreate.restype = ctypes.c_void_p
    gd.gdImagePngPtr.restype = ctypes.c_void_p
    gd.gdImageColorAllocate.restype = ctypes.c_int
    HAVE_LIBGD = True
except OSError:  # pragma: no cover
    gd = None
    HAVE_LIBGD = False


def _png_bytes(imv) -> bytes:
    sz = ctypes.c_int()
    p = gd.gdImagePngPtr(imv, ctypes.byref(sz))
    data = ctypes.string_at(p, sz.value)
    gd.gdFree(ctypes.c_void_p(p))
    return data


def truecolor_png(arr: np.ndarray, alpha: np.ndarray | None = None,
                  interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 (+ optional (h, w) gd 7-bit alpha) -> real PNG."""
    h, w = arr.shape[:2]
    imv = ctypes.c_void_p(gd.gdImageCreateTrueColor(w, h))
    if alpha is not None:
        gd.gdImageAlphaBlending(imv, 0)
        gd.gdImageSaveAlpha(imv, 1)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            col = (r << 16) | (g << 8) | b
            if alpha is not None:
                col |= int(alpha[y, x]) << 24
            gd.gdImageSetPixel(imv, x, y, col)
    if interlace:
        gd.gdImageInterlace(imv, 1)
    data = _png_bytes(imv)
    gd.gdImageDestroy(imv)
    return data


def palette_png(indices: np.ndarray, colors: np.ndarray,
                interlace: bool = False) -> tuple[bytes, np.ndarray]:
    """Index map + palette -> real palette PNG; returns (png, rgb)."""
    h, w = indices.shape
    imv = ctypes.c_void_p(gd.gdImageCreate(w, h))
    idxs = [gd.gdImageColorAllocate(imv, int(r), int(g), int(b))
            for r, g, b in colors]
    for y in range(h):
        for x in range(w):
            gd.gdImageSetPixel(imv, x, y, idxs[indices[y, x]])
    if interlace:
        gd.gdImageInterlace(imv, 1)
    data = _png_bytes(imv)
    gd.gdImageDestroy(imv)
    return data, colors[indices].astype(np.uint8)


def gd_alpha_to_png(a: np.ndarray) -> np.ndarray:
    """gd 7-bit alpha (0=opaque..127=transparent) -> PNG 8-bit alpha."""
    return np.round((127 - a.astype(np.float64)) * 255 / 127).astype(np.uint8)


# -- GIF helpers (reference producer/consumer for tests/test_gif.py) --------

if HAVE_LIBGD:
    gd.gdImageGifPtr.restype = ctypes.c_void_p
    gd.gdImageCreateFromGifPtr.restype = ctypes.c_void_p
    gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
    HAVE_GD_GIF = (hasattr(gd, "gdImageGifPtr")
                   and hasattr(gd, "gdImageCreateFromGifPtr"))
else:  # pragma: no cover
    HAVE_GD_GIF = False


def palette_gif(indices: np.ndarray, colors: np.ndarray,
                interlace: bool = False) -> tuple[bytes, np.ndarray]:
    """Index map + palette -> real (libgd-encoded) GIF; returns (gif, rgb)."""
    h, w = indices.shape
    imv = ctypes.c_void_p(gd.gdImageCreate(w, h))
    idxs = [gd.gdImageColorAllocate(imv, int(r), int(g), int(b))
            for r, g, b in colors]
    for y in range(h):
        for x in range(w):
            gd.gdImageSetPixel(imv, x, y, idxs[indices[y, x]])
    if interlace:
        gd.gdImageInterlace(imv, 1)
    sz = ctypes.c_int()
    p = gd.gdImageGifPtr(imv, ctypes.byref(sz))
    data = ctypes.string_at(p, sz.value)
    gd.gdFree(ctypes.c_void_p(p))
    gd.gdImageDestroy(imv)
    return data, colors[indices].astype(np.uint8)


def gd_decode_gif(payload: bytes) -> np.ndarray:
    """libgd-decoded first frame as (h, w, 3) uint8 RGB."""
    imv = ctypes.c_void_p(
        gd.gdImageCreateFromGifPtr(len(payload), payload))
    if not imv:
        raise ValueError("libgd failed to decode GIF")
    if hasattr(gd, "gdImagePaletteToTrueColor"):
        gd.gdImagePaletteToTrueColor(imv)
    # gdImageSX/SY are macros; the logical-screen dims from the GIF header
    # equal gd's canvas for single-frame images
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            c = gd.gdImageGetTrueColorPixel(imv, x, y)
            out[y, x] = ((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)
    gd.gdImageDestroy(imv)
    return out


# -- BMP helpers (reference producer/consumer for tests/test_bmp_tiff.py) ---

if HAVE_LIBGD:
    HAVE_GD_BMP = hasattr(gd, "gdImageBmpPtr") \
        and hasattr(gd, "gdImageCreateFromBmpPtr")
    if HAVE_GD_BMP:
        gd.gdImageBmpPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromBmpPtr.restype = ctypes.c_void_p
else:  # pragma: no cover
    HAVE_GD_BMP = False


def truecolor_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> real (libgd-encoded) 24-bit BMP."""
    h, w = arr.shape[:2]
    imv = ctypes.c_void_p(gd.gdImageCreateTrueColor(w, h))
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            gd.gdImageSetPixel(imv, x, y, (r << 16) | (g << 8) | b)
    sz = ctypes.c_int()
    p = gd.gdImageBmpPtr(imv, ctypes.byref(sz), 0)
    data = ctypes.string_at(p, sz.value)
    gd.gdFree(ctypes.c_void_p(p))
    gd.gdImageDestroy(imv)
    return data


def gd_decode_bmp(payload: bytes) -> np.ndarray:
    """libgd-decoded BMP as (h, w, 3) uint8 RGB (dims from the header)."""
    imv = ctypes.c_void_p(gd.gdImageCreateFromBmpPtr(len(payload), payload))
    if not imv:
        raise ValueError("libgd failed to decode BMP")
    if hasattr(gd, "gdImagePaletteToTrueColor"):
        gd.gdImagePaletteToTrueColor(imv)
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = abs(int.from_bytes(payload[22:26], "little", signed=True))
    gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            c = gd.gdImageGetTrueColorPixel(imv, x, y)
            out[y, x] = ((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)
    gd.gdImageDestroy(imv)
    return out
