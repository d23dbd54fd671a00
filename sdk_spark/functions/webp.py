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
prediction filters).  Remaining honest gap, raised by feature name:
ANIM/ANMF (animated WebP) chunks.
"""

from __future__ import annotations

import numpy as np

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
    """Encode (h, w, 3) uint8 RGB (or (h, w) gray) as lossless VP8L."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    if w > 16384 or h > 16384:
        raise ValueError("VP8L dimensions cap at 16384")
    bw = _LsbBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)   # no alpha
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no transforms
    bw.write(0, 1)   # no color cache
    bw.write(0, 1)   # no meta prefix image
    # 5 prefix codes: green(+lengths), red, blue, alpha, distance
    _write_flat256_code(bw, GREEN_ALPHABET)
    _write_flat256_code(bw, 256)    # red
    _write_flat256_code(bw, 256)    # blue
    _write_simple_code(bw, 255)     # alpha: constant opaque
    _write_simple_code(bw, 0)       # distance: unused
    flat = arr.reshape(-1, 3)
    # flat 8-bit canonical code over 0..255 assigns symbol i the code i
    for r, g, b in flat:
        bw.write_code(int(g), 8)
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def decode_webp(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode a WebP container to (h, w, 3) uint8 RGB (or RGBA with
    ``return_alpha``).

    Full-bitstream decoders for both flavors: lossless VP8L (all
    transforms, color cache, LZ77, meta prefix codes — ``vp8l.py``) and
    lossy VP8 key frames (``vp8.py``), each proven bit-exact against
    libwebp in tests.  Extended (VP8X) containers are walked to their
    chunks; ALPH alpha planes decode for real (raw + lossless, all four
    prediction filters).  Animation chunks raise by feature name.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP)")
    pos = 12
    alpha_body = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            from .vp8l import decode_vp8l

            # VP8L carries its own alpha channel
            out = decode_vp8l(body, return_alpha=return_alpha)
            return out
        if tag == b"VP8 ":
            from .vp8 import decode_vp8_rgb

            rgb = decode_vp8_rgb(body)
            if not return_alpha:
                return rgb
            import numpy as _np

            h, w = rgb.shape[:2]
            if alpha_body is not None:
                from .vp8l import decode_alpha

                a = decode_alpha(alpha_body, w, h)
            else:
                a = _np.full((h, w), 255, dtype=_np.uint8)
            return _np.dstack([rgb, a])
        if tag == b"ALPH":
            alpha_body = body
        elif tag in (b"ANIM", b"ANMF"):
            raise NotImplementedError(
                f"webp feature not supported by the subset decoder: "
                f"{tag.decode().strip()}")
        # VP8X and metadata chunks (ICCP/EXIF/XMP): skip
        pos += 8 + size + (size & 1)
    raise ValueError("missing VP8L/VP8 image chunk")
