"""ctypes bindings to the system libwebp — reference oracle for VP8 tests.

Used only by tests: generates real lossy-WebP fixtures and provides the
reference YUV decode that sdk_spark.functions.vp8 is asserted bit-exact
against.  Gated: ``HAVE_LIBWEBP`` is False when the shared library is
absent, and the VP8 conformance tests skip.
"""
from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

try:
    _name = ctypes.util.find_library("webp") or "libwebp.so.7"
    lib = ctypes.CDLL(_name)
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    HAVE_LIBWEBP = True
except OSError:  # pragma: no cover - environment without libwebp
    lib = None
    HAVE_LIBWEBP = False

# WEBP_ENCODER_ABI_VERSION for the 1.x series present in this image
_ABI = 0x020F


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int),
        ("quality", ctypes.c_float),
        ("method", ctypes.c_int),
        ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int),
        ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int),
        ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int),
        ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int),
        ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 8),
    ]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_size_t),
        ("max_size", ctypes.c_size_t),
        ("pad", ctypes.c_uint32 * 1),
    ]


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int),
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int),
        ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)),
        ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)),
        ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p),
        ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.POINTER(ctypes.c_uint8)),
        ("pad5", ctypes.POINTER(ctypes.c_uint8)),
        ("pad6", ctypes.c_uint32 * 8),
        # private fields (encode.h): the Init memset covers these too —
        # omitting them undersizes the struct and corrupts the heap
        ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
        # safety margin against future ABI growth (bigger is harmless)
        ("tail_guard", ctypes.c_uint8 * 64),
    ]


def encode_rgb(img: np.ndarray, quality: float = 90.0) -> bytes:
    """Lossy encode via the simple API (libwebp default settings)."""
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(img.tobytes(), w, h, w * 3,
                          ctypes.c_float(quality), ctypes.byref(out))
    assert n, "libwebp encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_rgb_advanced(img: np.ndarray, quality: float = 90.0,
                        **overrides) -> bytes:
    """Lossy encode via WebPEncode with WebPConfig field overrides
    (e.g. filter_type=1, filter_sharpness=5, partitions=3, segments=1)."""
    h, w = img.shape[:2]
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), _ABI), \
        "WebPConfig ABI mismatch"
    for k, v in overrides.items():
        setattr(cfg, k, v)
    assert lib.WebPValidateConfig(ctypes.byref(cfg)), \
        f"invalid config {overrides}"

    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), _ABI), \
        "WebPPicture ABI mismatch"
    pic.width, pic.height = w, h
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), img.tobytes(), w * 3)

    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"WebPEncode failed: error_code={pic.error_code}"
    data = ctypes.string_at(wr.mem, wr.size)
    lib.WebPFree(wr.mem)
    return data


def decode_yuv(data: bytes):
    """Reference decode to raw (y, u, v) planes via WebPDecodeYUV."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, ctypes.c_size_t(len(data)),
                           ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(u), ctypes.byref(v),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "libwebp decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, shape=(H, S))[:, :W].copy()
    uu = np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy()
    vv = np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy()
    lib.WebPFree(yp)
    return y, uu, vv


def vp8_chunk(webp_bytes: bytes) -> bytes:
    """Extract the raw VP8 chunk payload from a RIFF/WEBP container."""
    assert webp_bytes[:4] == b"RIFF" and webp_bytes[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp_bytes):
        tag = webp_bytes[pos:pos + 4]
        ln = int.from_bytes(webp_bytes[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return webp_bytes[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("no VP8 chunk")


def decode_rgba(data: bytes) -> np.ndarray:
    """Reference decode to (h, w, 4) RGBA via WebPDecodeRGBA."""
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                           ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp RGBA decode failed"
    out = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    lib.WebPFree(p)
    return out
