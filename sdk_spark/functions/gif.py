"""GIF codec in pure Python/numpy — GIF87a/GIF89a (no codec libraries).

Decoder: full static + animated feature set — global/local color tables,
variable-width LZW (deferred-clear tolerant, per giflib), interlacing
(4-pass), GIF89a graphic-control extensions (transparency index, frame
delay, disposal methods 0-3 with correct compositing), NETSCAPE loop
extension, comment/plain-text/application blocks skipped per spec.

Encoder: palette-exact (lossless for images with <= 256 distinct colors;
raises for more — no quantizer, fixtures are planted with bounded
palettes), real greedy LZW with code-width growth and table reset, optional
interlace, transparency and multi-frame animation.

Conformance: tests/test_gif.py round-trips against the system libgd
(gdImageCreateFromGifPtr / gdImageGifPtr / gdImageGifAnimAddPtr), so both
directions of the bitstream are validated by an external codec, not just
self-consistent (same protocol as tests/test_vp8.py vs libwebp).

Reference parity note: the json-structure reference SDK contains no image
codecs; this module serves the engine's multimodal tier (decode breadth
for real-crawl formats; undecodable payloads surface as violation rows).
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, CLEAR/EOI codes, 12-bit cap)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Decode GIF LZW data to ``n_pixels`` palette indices.

    Tolerates deferred clear codes (table stays at 4096 until an explicit
    CLEAR, per giflib) and early EOI / short streams (pads with 0 like
    browsers do, so truncated-but-parseable frames still composite).
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # table as parallel prefix/suffix lists (index = code; plain lists —
    # per-element numpy scalar reads are 5x slower in this serial loop)
    prefix = [-1] * 4096
    suffix = [0] * 4096
    for i in range(clear):
        suffix[i] = i

    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1

    acc = 0
    nbits = 0
    pos = 0
    ln = len(data)
    # decode-one-code expansion buffer
    stack = bytearray(4096)

    while len(out) < n_pixels:
        if nbits < width:
            chunk = data[pos:pos + 8]      # bulk refill (LSB-first)
            if not chunk:
                # short stream: pad remaining pixels (browser behavior)
                out.extend(b"\x00" * (n_pixels - len(out)))
                return out
            acc |= int.from_bytes(chunk, "little") << nbits
            nbits += 8 * len(chunk)
            pos += len(chunk)
            if nbits < width:
                out.extend(b"\x00" * (n_pixels - len(out)))
                return out
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            out.extend(b"\x00" * (n_pixels - len(out)))
            return out
        if code >= next_code and not (code == next_code and prev >= 0):
            raise ValueError("corrupt GIF LZW stream (code out of range)")

        # expand `code` (or prev+first(prev) for the KwKwK case)
        sp = 0
        if code == next_code:          # KwKwK: code not yet in table
            cur = prev
            stack[sp] = 0              # placeholder, fixed below
            sp = 1
        else:
            cur = code
        while cur >= 0:
            stack[sp] = suffix[cur]
            sp += 1
            cur = prefix[cur]
        first = stack[sp - 1]
        if code == next_code:
            stack[0] = first
        # emit reversed
        out.extend(stack[sp - 1::-1])

        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code

    return out


class _SubBlockWriter:
    """Packs an LZW bitstream into 255-byte GIF sub-blocks."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.bytes = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        b = self.bytes
        for i in range(0, len(b), 255):
            chunk = b[i:i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)                  # block terminator
        return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Greedy LZW encoder (dict on (prefix_code, byte)), giflib-compatible."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _SubBlockWriter()
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1

    bw.write(clear, width)
    it = iter(int(x) for x in indices)
    prev = next(it)
    for k in it:
        ent = table.get((prev, k))
        if ent is not None:
            prev = ent
            continue
        bw.write(prev, width)
        table[(prev, k)] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            bw.write(clear, width)
            width = min_code_size + 1
            table.clear()
            next_code = eoi + 1
        prev = k
    bw.write(prev, width)
    bw.write(eoi, width)
    return bw.finish()


# ---------------------------------------------------------------------------
# container parsing
# ---------------------------------------------------------------------------


def _read_color_table(payload: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    ct = np.frombuffer(payload[pos:pos + 3 * n], dtype=np.uint8)
    if ct.size < 3 * n:
        raise ValueError("truncated GIF color table")
    return ct.reshape(n, 3).copy(), pos + 3 * n


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(payload[pos:pos + n])
        if len(payload) - pos < n:
            raise ValueError("truncated GIF sub-blocks")
        pos += n


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


@malformed_input_guard('gif')
def decode_gif_frames(payload: bytes):
    """Decode ALL frames of a GIF, fully composited.

    Returns ``(frames, delays_cs, loop_count)`` where ``frames`` is a list
    of (h, w, 3) uint8 RGB canvases (logical-screen sized, disposal methods
    0-3 applied) and ``delays_cs`` the per-frame delay in centiseconds.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (packed & 0x07))

    if sw == 0 or sh == 0 or sw * sh > (1 << 26):
        raise ValueError("GIF logical screen dimensions out of range")

    bg_rgb = (gct[bg_index] if gct is not None and bg_index < len(gct)
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).astype(np.uint8).copy()
    painted = np.zeros((sh, sw), dtype=bool)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop_count = 1
    # pending graphic-control state
    transparent = -1
    delay_cs = 0
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:              # trailer
            break
        if block == 0x21:              # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:          # graphic control
                body, pos = _read_sub_blocks(payload, pos)
                if len(body) >= 4:
                    flags = body[0]
                    disposal = (flags >> 2) & 0x07
                    delay_cs = int.from_bytes(body[1:3], "little")
                    transparent = body[3] if flags & 0x01 else -1
            elif label == 0xFF:        # application (NETSCAPE loop)
                body, pos = _read_sub_blocks(payload, pos)
                if body[:11] == b"NETSCAPE2.0" and len(body) >= 14:
                    loop_count = int.from_bytes(body[12:14], "little")
            else:                      # comment / plain text / other
                pos = _skip_sub_blocks(payload, pos)
            continue
        if block != 0x2C:              # image descriptor
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        if len(payload) - pos < 9:
            raise ValueError("truncated GIF image descriptor")
        fx = int.from_bytes(payload[pos:pos + 2], "little")
        fy = int.from_bytes(payload[pos + 2:pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6:pos + 8], "little")
        fpacked = payload[pos + 8]
        pos += 9
        ct = gct
        if fpacked & 0x80:
            ct, pos = _read_color_table(payload, pos, 2 << (fpacked & 0x07))
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if fx + fw > sw or fy + fh > sh or fw == 0 or fh == 0:
            raise ValueError("GIF frame rectangle outside logical screen")

        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("GIF LZW minimum code size out of range")
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, fw * fh), dtype=np.uint8).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fh)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")

        prev_canvas = canvas.copy() if disposal == 3 else None
        prev_painted = painted.copy() if disposal == 3 else None

        region = canvas[fy:fy + fh, fx:fx + fw]
        opaque = (idx != transparent) if transparent >= 0 \
            else np.ones((fh, fw), dtype=bool)
        region[opaque] = ct[idx[opaque]]
        painted[fy:fy + fh, fx:fx + fw] |= opaque
        frames.append(canvas.copy())
        delays.append(delay_cs)

        if disposal == 2:              # restore background
            canvas[fy:fy + fh, fx:fx + fw] = bg_rgb
            painted[fy:fy + fh, fx:fx + fw] = False
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
            painted = prev_painted
        transparent, delay_cs, disposal = -1, 0, 0

    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames, delays, loop_count


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    frames, _, _ = decode_gif_frames(payload)
    return frames[0]


# ---------------------------------------------------------------------------
# encoder (palette-exact; fixture generator + resize/re-encode sink)
# ---------------------------------------------------------------------------


def _palettize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) | \
             (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    colors, inverse = np.unique(packed, return_inverse=True)
    if colors.size > 256:
        raise ValueError(
            f"encode_gif is palette-exact: {colors.size} distinct colors "
            "(> 256); quantize upstream")
    palette = np.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF,
                        colors & 0xFF], axis=1).astype(np.uint8)
    return palette, inverse.astype(np.uint8).reshape(h, w)


def _color_table_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad palette to a power-of-two size; returns (bytes, size_field)."""
    n = max(2, int(palette.shape[0]))
    bits = max(1, (n - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[:palette.shape[0]] = palette
    return full.tobytes(), bits - 1


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _frame_blocks(idx: np.ndarray, palette: np.ndarray, fx: int, fy: int,
                  local_ct: bool, interlace: bool) -> bytes:
    h, w = idx.shape
    if interlace:
        idx = idx[_interlace_order(h)]
    out = bytearray(b"\x2C")
    out += fx.to_bytes(2, "little") + fy.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_ct:
        ct_bytes, size_field = _color_table_bytes(palette)
        out.append(0x80 | (0x40 if interlace else 0) | size_field)
        out += ct_bytes
    else:
        out.append(0x40 if interlace else 0x00)
    mcs = max(2, (max(2, int(palette.shape[0])) - 1).bit_length())
    out.append(mcs)
    out += _lzw_encode(idx.reshape(-1), mcs)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False,
               transparent_rgb: tuple[int, int, int] | None = None) -> bytes:
    """Encode (h, w, 3) uint8 RGB losslessly (<= 256 distinct colors)."""
    palette, idx = _palettize(arr)
    h, w = idx.shape
    ct_bytes, size_field = _color_table_bytes(palette)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (size_field << 4) | size_field)   # GCT + color res
    out += b"\x00\x00"                                  # bg index, aspect
    out += ct_bytes
    if transparent_rgb is not None:
        match = np.all(palette == np.array(transparent_rgb, dtype=np.uint8),
                       axis=1)
        tix = int(np.argmax(match)) if match.any() else -1
        if tix >= 0:
            out += b"\x21\xF9\x04\x01\x00\x00" + bytes([tix]) + b"\x00"
    out += _frame_blocks(idx, palette, 0, 0, local_ct=False,
                         interlace=interlace)
    out += b"\x3B"
    return bytes(out)


def encode_gif_animation(frames: list[np.ndarray], delays_cs: list[int],
                         loop_count: int = 0) -> bytes:
    """Animated GIF from full-canvas RGB frames (per-frame local palettes,
    disposal=1 'leave in place' — each frame repaints the whole canvas)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x70\x00\x00"                              # no GCT
    out += (b"\x21\xFF\x0BNETSCAPE2.0\x03\x01"
            + int(loop_count).to_bytes(2, "little") + b"\x00")
    for arr, delay in zip(frames, delays_cs):
        if arr.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        palette, idx = _palettize(arr)
        out += (b"\x21\xF9\x04" + bytes([0x04])         # disposal=1
                + int(delay).to_bytes(2, "little") + b"\x00\x00")
        out += _frame_blocks(idx, palette, 0, 0, local_ct=True,
                             interlace=False)
    out += b"\x3B"
    return bytes(out)
