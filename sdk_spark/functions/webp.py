"""WebP codec in pure Python — no codec libraries at runtime.

Container + lossless (VP8L) subset here; **lossy VP8 key frames decode
fully** via ``vp8.py`` (all intra modes, segmentation, partitions, loop
filter — bit-exact against libwebp in tests/test_vp8.py).

VP8L (lossless):
* **encoder**: literal-only ARGB coding (no transforms, no color cache, no
  LZ77 backreferences) — flat 8-bit codes for G/R/B channels, single-symbol
  simple codes for constant channels. Always valid VP8L; ~3 bytes/pixel.
* **decoder**: the FULL bitstream lives in ``vp8l.py`` (all four
  transforms, color cache, LZ77 with the 2D distance map, meta prefix
  codes) — this module's simple-subset reader remains only as the
  encoder's round-trip twin; ``decode_webp`` routes VP8L payloads to the
  full decoder.

ALPH alpha planes decode for real (raw + lossless compression, all four
prediction filters), and animated containers (VP8X/ANIM/ANMF) decode
fully composited via ``decode_webp_frames`` (blending + disposal).
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

# code-length-code symbol order (VP8L spec §6.2.2; same role as DEFLATE's)
K_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15]
GREEN_ALPHABET = 256 + 24  # literals + length-prefix codes (no cache)


class _LsbBitWriter:
    """LSB-first bit packing (VP8L convention)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix codes are emitted MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment by (length, symbol)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        length = lengths[sym]
        code <<= (length - prev_len)
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


# -- encoder -------------------------------------------------------------------

def _write_simple_code(bw: _LsbBitWriter, symbol: int) -> None:
    bw.write(1, 1)        # simple
    bw.write(0, 1)        # num_symbols - 1 = 0
    bw.write(1, 1)        # first symbol uses 8 bits
    bw.write(symbol, 8)


def _write_flat256_code(bw: _LsbBitWriter, alphabet: int) -> None:
    """Normal code: symbols 0..255 all length 8 (complete), rest zero via a
    max_symbol cap when the alphabet is larger."""
    bw.write(0, 1)                      # not simple
    bw.write(12 - 4, 4)                 # num_code_lengths = 12 (covers 16, 8)
    # 3-bit lengths for K_CODE_LENGTH_ORDER[0:12]:
    # symbol 16 sits at index 8, symbol 8 at index 11 — both get length 1
    for idx in range(12):
        sym = K_CODE_LENGTH_ORDER[idx]
        bw.write(1 if sym in (8, 16) else 0, 3)
    # code-length code: {8: len1, 16: len1} → canonical: 8→'0', 16→'1'
    cl_codes = _canonical_codes({8: 1, 16: 1})
    # token plan: one literal '8', then sym-16 repeats (3 + 2bits copies of
    # the previous length) until 256 lengths are assigned
    tokens: list[tuple[int, int | None]] = [(8, None)]
    remaining = 255
    while remaining > 0:
        n = min(6, remaining)
        if n < 3:
            tokens.extend((8, None) for _ in range(n))
            remaining = 0
        else:
            tokens.append((16, n - 3))
            remaining -= n
    if alphabet > 256:
        # max_symbol caps the number of length-code READS (libwebp
        # decrements once per loop iteration), not assigned symbols
        bw.write(1, 1)
        bw.write(3, 3)                   # length_nbits = 2 + 2*3 = 8
        bw.write(len(tokens) - 2, 8)     # max_symbol = 2 + value
    else:
        bw.write(0, 1)
    for sym, extra in tokens:
        code, length = cl_codes[sym]
        bw.write_code(code, length)
        if extra is not None:
            bw.write(extra, 2)


def encode_webp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB / (h, w, 4) RGBA uint8 (or (h, w) gray) as
    lossless VP8L."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    has_alpha = arr.shape[2] == 4
    h, w = arr.shape[:2]
    if w > 16384 or h > 16384:
        raise ValueError("VP8L dimensions cap at 16384")
    bw = _LsbBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)   # alpha hint
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no transforms
    bw.write(0, 1)   # no color cache
    bw.write(0, 1)   # no meta prefix image
    # 5 prefix codes: green(+lengths), red, blue, alpha, distance
    _write_flat256_code(bw, GREEN_ALPHABET)
    _write_flat256_code(bw, 256)    # red
    _write_flat256_code(bw, 256)    # blue
    if has_alpha:
        _write_flat256_code(bw, 256)
    else:
        _write_simple_code(bw, 255)  # alpha: constant opaque
    _write_simple_code(bw, 0)       # distance: unused
    flat = arr.reshape(-1, arr.shape[2])
    # flat 8-bit canonical code over 0..255 assigns symbol i the code i
    for px in flat:
        bw.write_code(int(px[1]), 8)
        bw.write_code(int(px[0]), 8)
        bw.write_code(int(px[2]), 8)
        if has_alpha:
            bw.write_code(int(px[3]), 8)
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _decode_still(tag: bytes, body: bytes, alpha_body: bytes | None,
                  return_alpha: bool) -> np.ndarray:
    """One VP8/VP8L payload (+ optional ALPH plane) -> RGB or RGBA."""
    if tag == b"VP8L":
        from .vp8l import decode_vp8l

        # VP8L carries its own alpha channel
        return decode_vp8l(body, return_alpha=return_alpha)
    from .vp8 import decode_vp8_rgb

    rgb = decode_vp8_rgb(body)
    if not return_alpha:
        return rgb
    h, w = rgb.shape[:2]
    if alpha_body is not None:
        from .vp8l import decode_alpha

        a = decode_alpha(alpha_body, w, h)
    else:
        a = np.full((h, w), 255, dtype=np.uint8)
    return np.dstack([rgb, a])


def _walk_chunks(payload: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + size > end:
            raise ValueError("truncated WebP chunk")
        yield tag, payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def _blend_rgba(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Straight-alpha 'over' compositing (WebP ANMF blending method 0)."""
    sa = src[..., 3:4].astype(np.float64) / 255.0
    da = dst[..., 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1.0 - sa)
    rgb = np.where(oa > 0,
                   (src[..., :3] * sa + dst[..., :3] * da * (1.0 - sa)) /
                   np.maximum(oa, 1e-12), 0)
    out = np.concatenate([rgb, oa * 255.0], axis=2)
    return np.round(out).clip(0, 255).astype(np.uint8)


@malformed_input_guard('webp')
def decode_webp_frames(payload: bytes):
    """Decode ALL frames of a (possibly animated) WebP, fully composited.

    Returns ``(frames, durations_ms, loop_count)``; frames are canvas-sized
    (h, w, 4) uint8 RGBA with ANMF blending (methods 0/1) and disposal
    (none / to-background) applied.  Still images yield one frame.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP)")
    canvas = None
    bg = np.zeros(4, dtype=np.uint8)
    loop_count = 1
    frames: list[np.ndarray] = []
    durations: list[int] = []
    alpha_body = None
    for tag, body in _walk_chunks(payload, 12, len(payload)):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X chunk")
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("truncated ANIM chunk")
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)
            loop_count = int.from_bytes(body[4:6], "little")
            if canvas is None:
                raise ValueError("ANIM chunk before VP8X")
            canvas[:] = bg
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("truncated ANMF chunk")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            sub_alpha = None
            frame_rgba = None
            for stag, sbody in _walk_chunks(body, 16, len(body)):
                if stag == b"ALPH":
                    sub_alpha = sbody
                elif stag in (b"VP8 ", b"VP8L"):
                    frame_rgba = _decode_still(stag, sbody, sub_alpha, True)
                    break
            if frame_rgba is None:
                raise ValueError("ANMF frame missing VP8/VP8L payload")
            if frame_rgba.shape[:2] != (fh, fw):
                raise ValueError("ANMF declared frame size mismatch")
            if canvas is None:
                raise ValueError("ANMF chunk before VP8X")
            if fy + fh > canvas.shape[0] or fx + fw > canvas.shape[1]:
                raise ValueError("ANMF frame rectangle outside canvas")
            region = canvas[fy:fy + fh, fx:fx + fw]
            canvas[fy:fy + fh, fx:fx + fw] = (
                frame_rgba if no_blend else _blend_rgba(region, frame_rgba))
            frames.append(canvas.copy())
            durations.append(dur)
            if dispose_bg:
                canvas[fy:fy + fh, fx:fx + fw] = bg
        elif tag == b"ALPH":
            alpha_body = body
        elif tag in (b"VP8 ", b"VP8L"):
            frames.append(_decode_still(tag, body, alpha_body, True))
            durations.append(0)
            break
        # ICCP/EXIF/XMP metadata chunks: skip
    if not frames:
        raise ValueError("missing VP8L/VP8 image chunk")
    return frames, durations, loop_count


@malformed_input_guard('webp')
def decode_webp(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode a WebP container to (h, w, 3) uint8 RGB (or RGBA with
    ``return_alpha``).

    Full-bitstream decoders for both flavors: lossless VP8L (all
    transforms, color cache, LZ77, meta prefix codes — ``vp8l.py``) and
    lossy VP8 key frames (``vp8.py``), each proven bit-exact against
    libwebp in tests.  Extended (VP8X) containers are walked to their
    chunks; ALPH alpha planes decode for real (raw + lossless, all four
    prediction filters).  Animated (ANIM/ANMF) containers return the
    first composited frame — ``decode_webp_frames`` yields them all.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP)")
    alpha_body = None
    for tag, body in _walk_chunks(payload, 12, len(payload)):
        if tag in (b"VP8L", b"VP8 "):
            return _decode_still(tag, body, alpha_body, return_alpha)
        if tag == b"ALPH":
            alpha_body = body
        elif tag == b"ANMF":
            frames, _, _ = decode_webp_frames(payload)
            first = frames[0]
            return first if return_alpha else first[..., :3]
        # VP8X/ANIM and metadata chunks (ICCP/EXIF/XMP): skip
    raise ValueError("missing VP8L/VP8 image chunk")


def _anim_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + len(body).to_bytes(4, "little") + body + \
        (b"\x00" if len(body) & 1 else b"")


def encode_webp_animation(frames: list[np.ndarray],
                          durations_ms: list[int],
                          loop_count: int = 0,
                          offsets: list[tuple[int, int]] | None = None,
                          no_blend: bool = True,
                          dispose_bg: bool = False,
                          canvas_wh: tuple[int, int] | None = None,
                          background=(255, 255, 255, 255)) -> bytes:
    """Animated WebP from RGB(A) frames (VP8L-coded, lossless).

    Defaults to full-canvas no-blend frames (exact round trip through
    ``decode_webp_frames``); ``offsets`` places sub-rect frames (must be
    even per the ANMF x/2,y/2 encoding).
    """
    if not frames:
        raise ValueError("no frames")
    if canvas_wh is None:
        canvas_wh = (frames[0].shape[1], frames[0].shape[0])
    cw, ch = canvas_wh
    offsets = offsets or [(0, 0)] * len(frames)
    flags = 0x02 | (0x10 if any(f.ndim == 3 and f.shape[2] == 4
                                for f in frames) else 0)
    vp8x = bytes([flags, 0, 0, 0]) + \
        (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    r, g, b, a = background
    anim = bytes([b, g, r, a]) + int(loop_count).to_bytes(2, "little")
    out = bytearray(_anim_chunk(b"VP8X", vp8x) + _anim_chunk(b"ANIM", anim))
    for arr, dur, (fx, fy) in zip(frames, durations_ms, offsets):
        if fx % 2 or fy % 2:
            raise ValueError("ANMF offsets must be even")
        fh, fw = arr.shape[:2]
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("frame rectangle outside canvas")
        sub = encode_webp(arr)
        vp8l_body = next(body for tag, body in
                         _walk_chunks(sub, 12, len(sub)) if tag == b"VP8L")
        head = ((fx // 2).to_bytes(3, "little")
                + (fy // 2).to_bytes(3, "little")
                + (fw - 1).to_bytes(3, "little")
                + (fh - 1).to_bytes(3, "little")
                + int(dur).to_bytes(3, "little")
                + bytes([(0x02 if no_blend else 0)
                         | (0x01 if dispose_bg else 0)]))
        out += _anim_chunk(b"ANMF", head + _anim_chunk(b"VP8L", vp8l_body))
    riff = b"WEBP" + bytes(out)
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
