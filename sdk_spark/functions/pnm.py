"""PNM (portable anymap) codec: P5 grayscale / P6 RGB, binary forms.

The netpbm formats are the lingua franca of image-processing test suites
(and the reference output of many research pipelines).  Decode handles
``#`` comments anywhere in the header, arbitrary whitespace, and both
8-bit and 16-bit (big-endian, per spec) sample depths; 16-bit samples
are scaled to 8-bit output (the engine's pixel type).  Encode writes P6
(or P5 for 2-D input) with maxval 255.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard


def encode_pnm(arr: np.ndarray) -> bytes:
    if arr.ndim == 2:
        head = b"P5"
        body = arr.astype(np.uint8).tobytes()
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        head = b"P6"
        body = arr.astype(np.uint8).tobytes()
        h, w = arr.shape[:2]
    else:
        raise ValueError("encode_pnm expects (h, w) or (h, w, 3) uint8")
    return head + f"\n{w} {h}\n255\n".encode() + body


def _header_tokens(payload: bytes, count: int, pos: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated ints, skipping # comments."""
    out: list[int] = []
    n = len(payload)
    while len(out) < count:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos:pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("PNM header truncated")
        out.append(int(payload[start:pos]))
    return out, pos + 1          # single whitespace after maxval, per spec


@malformed_input_guard('pnm')
def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode P5/P6 to (h, w, 3) uint8 RGB (grayscale is replicated)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported PNM magic {magic!r} (P5/P6 only)")
    (w, h, maxval), pos = _header_tokens(payload, 3, 2)
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        raise ValueError("PNM dimensions out of range")
    if not 0 < maxval < 65536:
        raise ValueError(f"PNM maxval {maxval} out of range")
    ch = 3 if magic == b"P6" else 1
    wide = maxval > 255
    need = w * h * ch * (2 if wide else 1)
    data = payload[pos:pos + need]
    if len(data) < need:
        raise ValueError("PNM pixel data truncated")
    if wide:
        arr = np.frombuffer(data, dtype=">u2").astype(np.float64)
        arr = (arr * 255.0 / maxval).round().astype(np.uint8)
    else:
        arr = np.frombuffer(data, dtype=np.uint8)
        if maxval != 255:
            arr = (arr.astype(np.float64) * 255.0 / maxval) \
                .round().astype(np.uint8)
    arr = arr.reshape(h, w, ch)
    return arr if ch == 3 else np.repeat(arr, 3, axis=2)
