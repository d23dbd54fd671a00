"""ctypes bindings to the system libtiff — reference codec for TIFF tests.

Writes real libtiff-encoded fixtures (LZW with its early-change code
widths, PackBits, Deflate, horizontal predictor) and reads ours back
through TIFFReadRGBAImageOriented, so sdk_spark.functions.tiff is
validated against the canonical implementation in both directions.
Gated on library presence like tests/libwebp_ref.py.

Quirk pinned here: writing goes through TIFFWriteEncodedStrip, not
TIFFWriteScanline — through ctypes the scanline path applies the
horizontal predictor nondeterministically (the tag gets recorded but the
differencing is sometimes skipped, yielding a file even libtiff itself
cannot round-trip); the strip path is deterministic.
"""
from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

try:
    _name = ctypes.util.find_library("tiff") or "libtiff.so.6"
    tiff = ctypes.CDLL(_name)
    tiff.TIFFOpen.restype = ctypes.c_void_p
    tiff.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    tiff.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t]
    tiff.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
    tiff.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]
    tiff.TIFFSetErrorHandler(None)      # keep stderr quiet on bad fixtures
    tiff.TIFFSetWarningHandler(None)
    HAVE_LIBTIFF = True
except OSError:  # pragma: no cover - environment without libtiff
    tiff = None
    HAVE_LIBTIFF = False

_T = {"w": 256, "h": 257, "bps": 258, "comp": 259, "photo": 262,
      "spp": 277, "rps": 278, "planar": 284, "pred": 317}


def _set(handle, tag: int, val: int) -> None:
    assert tiff.TIFFSetField(ctypes.c_void_p(handle), ctypes.c_uint32(tag),
                             ctypes.c_int(val)) == 1


def write_tiff(path: str, img: np.ndarray, comp: int = 5,
               pred: int = 1, rps: int = 16) -> bytes:
    """RGB array -> libtiff-written file at ``path``; returns the bytes."""
    h, w = img.shape[:2]
    handle = tiff.TIFFOpen(path.encode(), b"w")
    assert handle, "TIFFOpen(w) failed"
    _set(handle, _T["w"], w)
    _set(handle, _T["h"], h)
    _set(handle, _T["bps"], 8)
    _set(handle, _T["spp"], 3)
    _set(handle, _T["comp"], comp)
    if pred != 1:
        _set(handle, _T["pred"], pred)     # MUST follow comp (see header)
    _set(handle, _T["photo"], 2)
    _set(handle, _T["rps"], rps)
    _set(handle, _T["planar"], 1)
    for si, y0 in enumerate(range(0, h, rps)):
        strip = np.ascontiguousarray(img[y0:y0 + rps])
        assert tiff.TIFFWriteEncodedStrip(
            ctypes.c_void_p(handle), si,
            strip.ctypes.data_as(ctypes.c_void_p),
            strip.nbytes) == strip.nbytes
    tiff.TIFFClose(ctypes.c_void_p(handle))
    with open(path, "rb") as fh:
        return fh.read()


def read_tiff(path: str, w: int, h: int) -> np.ndarray | None:
    """libtiff decode to (h, w, 3) RGB, top-left origin; None on failure."""
    handle = tiff.TIFFOpen(path.encode(), b"r")
    if not handle:
        return None
    buf = (ctypes.c_uint32 * (w * h))()
    ok = tiff.TIFFReadRGBAImageOriented(handle, w, h, buf, 1, 0)
    tiff.TIFFClose(ctypes.c_void_p(handle))
    if not ok:
        return None
    a = np.frombuffer(buf, dtype=np.uint32).reshape(h, w)
    return np.dstack([a & 255, (a >> 8) & 255, (a >> 16) & 255]) \
        .astype(np.uint8)
