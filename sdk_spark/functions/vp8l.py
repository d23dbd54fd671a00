"""Full lossless WebP (VP8L) decoder in pure Python — RFC 9649.

Complete bitstream support: all four transforms (predictor with 14
modes, color transform, subtract-green, color-indexing with pixel
bundling), color cache, LZ77 backward references with the 2D distance
map, meta prefix images, and simple + normal prefix codes.  Supersedes
the literal-only subset decoder in ``webp.py`` (whose encoder remains
the engine's synthetic-fixture writer).

Conformance: tests decode real ``WebPEncodeLosslessRGB`` output —
lossless means the only acceptable result is byte-identical RGB.

The 120-entry LZ77 distance-to-offset map is the spec table (RFC 9649
section 4.2.2), transcribed by tools/extract_vp8_tables.py-style anchor
search and verified by those round-trips.
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

# spec distance map: code -> (xoffset = 8 - (v & 0xF), yoffset = v >> 4)
_CODE_TO_PLANE = bytes([
    24, 7, 23, 25, 40, 6, 39, 41, 22, 26, 38, 42, 56, 5, 55, 57, 21, 27,
    54, 58, 37, 43, 72, 4, 71, 73, 20, 28, 53, 59, 70, 74, 36, 44, 88,
    69, 75, 52, 60, 3, 87, 89, 19, 29, 86, 90, 35, 45, 68, 76, 85, 91,
    51, 61, 104, 2, 103, 105, 18, 30, 102, 106, 34, 46, 84, 92, 67, 77,
    101, 107, 50, 62, 120, 1, 119, 121, 83, 93, 17, 31, 100, 108, 66,
    78, 118, 122, 33, 47, 117, 123, 49, 63, 99, 109, 82, 94, 0, 116,
    124, 65, 79, 16, 32, 98, 110, 48, 115, 125, 81, 95, 64, 114, 126,
    97, 111, 80, 113, 127, 96, 112])

_GREEN_BASE = 256 + 24


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class _Reader:
    """LSB-first bit reader (duplicated from webp.py to keep this module
    import-independent of the legacy subset decoder)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= byte << self.nbits
            self.nbits += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.nbits -= nbits
        return v

    def peek(self, nbits: int) -> int:
        """Next ``nbits`` stream bits without consuming (zero-padded at
        stream end) — the prefix LUT's window."""
        while self.nbits < nbits and self.pos < len(self.data):
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.acc & ((1 << nbits) - 1)

    def consume(self, nbits: int) -> None:
        if nbits > self.nbits:             # zero-padded tail bits
            nbits = self.nbits
        self.acc >>= nbits
        self.nbits -= nbits


# code-length-code symbol order (RFC 9649 section 4.1.1)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]


_LUT_BITS = 10                             # root-table window (zlib-style)


class _Prefix:
    """Canonical prefix decoder built from code lengths.

    Hot path is a root LUT over the next 10 stream bits (codes are read
    MSB-of-code-first but the stream is LSB-first, so the table is
    indexed by the BIT-REVERSED code): one list index + shift per symbol
    for every code of length <= 10; longer codes (rare) take the
    bit-walk fallback over a peeked window, consuming nothing until the
    code length is known."""

    __slots__ = ("single", "table", "maxlen", "lut", "lbits")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = next(iter(nz))
            self.table = {}
            self.maxlen = 0
            self.lut = None
            self.lbits = 0
            return
        self.single = None
        code = 0
        prev = 0
        self.table = {}
        self.maxlen = max(nz.values())
        self.lbits = min(self.maxlen, _LUT_BITS)
        lut = [0] * (1 << self.lbits)
        for sym in sorted(nz, key=lambda s: (nz[s], s)):
            ln = nz[sym]
            code <<= ln - prev
            self.table[(code, ln)] = sym
            if ln <= self.lbits:
                rev = int(f"{code:0{ln}b}"[::-1], 2)   # LSB-first index
                entry = (ln << 16) | sym
                step = 1 << ln
                for idx in range(rev, 1 << self.lbits, step):
                    lut[idx] = entry
            code += 1
            prev = ln
        self.lut = lut

    def decode(self, br: _Reader) -> int:
        if self.single is not None:
            return self.single
        e = self.lut[br.peek(self.lbits)]
        if e:
            br.consume(e >> 16)
            return e & 0xFFFF
        # long code: walk lengths over a peeked window, then consume once
        pk = br.peek(self.maxlen)
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | ((pk >> (ln - 1)) & 1)
            sym = self.table.get((code, ln))
            if sym is not None:
                br.consume(ln)
                return sym
        raise ValueError("invalid prefix code")


def _read_code(br: _Reader, alphabet: int) -> _Prefix:
    """Read one prefix code (simple or normal form)."""
    if br.read(1):                       # simple
        num = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num == 2:
            return _Prefix({sym0: 1, br.read(8): 1})
        return _Prefix({sym0: 1})
    num_cl = br.read(4) + 4
    cl_lengths = {}
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _Prefix({s: l for s, l in cl_lengths.items() if l})
    max_symbol = alphabet
    if br.read(1):                       # length-capped reading
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    lengths = {}
    sym = 0
    prev_len = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet:
                    lengths[sym] = prev_len
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:                            # 18
            sym += 11 + br.read(7)
    return _Prefix(lengths)


def _prefix_value(br: _Reader, code: int) -> int:
    """LZ77 length/distance prefix value (RFC 9649 section 4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _Group:
    __slots__ = ("g", "r", "b", "a", "d")


def _read_groups(br: _Reader, n: int, cache_bits: int) -> list:
    out = []
    for _ in range(n):
        grp = _Group()
        grp.g = _read_code(br, _GREEN_BASE +
                           ((1 << cache_bits) if cache_bits else 0))
        grp.r = _read_code(br, 256)
        grp.b = _read_code(br, 256)
        grp.a = _read_code(br, 256)
        grp.d = _read_code(br, 40)
        out.append(grp)
    return out


def _decode_pixels(br: _Reader, w: int, h: int, groups: list,
                   meta: np.ndarray | None, meta_bits: int,
                   cache_bits: int) -> np.ndarray:
    """Core spatial decode -> flat uint32 ARGB array of length w*h."""
    npix = w * h
    out = np.zeros(npix, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_mul = 0x1E35A7BD
    cache_shift = 32 - cache_bits if cache_bits else 0
    grp = groups[0]
    meta_w = _sub_size(w, meta_bits) if meta is not None else 0
    i = 0
    last_meta_tile = -1
    while i < npix:
        if meta is not None:
            x, y = i % w, i // w
            tile = (y >> meta_bits) * meta_w + (x >> meta_bits)
            if tile != last_meta_tile:
                grp = groups[int(meta[tile])]
                last_meta_tile = tile
        s = grp.g.decode(br)
        if s < 256:
            r = grp.r.decode(br)
            b = grp.b.decode(br)
            a = grp.a.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[i] = px
            if cache is not None:
                cache[(cache_mul * px & 0xFFFFFFFF) >> cache_shift] = px
            i += 1
        elif s < _GREEN_BASE:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, grp.d.decode(br))
            if dcode <= 120:
                v = _CODE_TO_PLANE[dcode - 1]
                dist = (v >> 4) * w + (8 - (v & 0xF))
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > i or i + length > npix:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[(cache_mul * px & 0xFFFFFFFF)
                          >> cache_shift] = px
                i += 1
            last_meta_tile = -1   # length may cross tiles/rows
        else:
            px = cache[s - _GREEN_BASE]
            out[i] = px
            i += 1
    return out


def _decode_image(br: _Reader, w: int, h: int) -> np.ndarray:
    """Entropy-coded subimage (no transforms, no meta prefix)."""
    cache_bits = br.read(4) if br.read(1) else 0
    groups = _read_groups(br, 1, cache_bits)
    return _decode_pixels(br, w, h, groups, None, 0, cache_bits)


# ---------------------------------------------------------------------------
# inverse transforms (RFC 9649 section 4.1)
# ---------------------------------------------------------------------------

def _avg2(a, b):
    return (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1, \
           (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1


def _unpack(px: int):
    return ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF,
            px & 0xFF)


def _pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) \
        | (b & 0xFF)


def _average2(p0: int, p1: int) -> int:
    return _pack(*[(c0 + c1) >> 1 for c0, c1 in
                   zip(_unpack(p0), _unpack(p1))])


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _average2(_average2(L, TR), T)
    if mode == 6:
        return _average2(L, TL)
    if mode == 7:
        return _average2(L, T)
    if mode == 8:
        return _average2(TL, T)
    if mode == 9:
        return _average2(T, TR)
    if mode == 10:
        return _average2(_average2(L, TL), _average2(T, TR))
    if mode == 11:                        # select
        lc, tc, tlc = _unpack(L), _unpack(T), _unpack(TL)
        pl = sum(abs(tc[i] - tlc[i]) for i in range(4))   # error picking L
        pt = sum(abs(lc[i] - tlc[i]) for i in range(4))   # error picking T
        # tie goes to T (libwebp Select returns `top` when <=)
        return T if pt <= pl else L
    if mode == 12:                        # clamp add subtract full
        return _pack(*[_clamp(c0 + c1 - c2) for c0, c1, c2 in
                       zip(_unpack(L), _unpack(T), _unpack(TL))])
    if mode == 13:                        # clamp add subtract half
        out = []
        for c0, c1, c2 in zip(_unpack(L), _unpack(T), _unpack(TL)):
            ave = (c0 + c1) >> 1
            d = ave - c2
            # C integer division truncates toward zero (libwebp
            # AddSubtractComponentHalf uses (a - b) / 2, not >> 1)
            out.append(_clamp(ave + (d // 2 if d >= 0 else -((-d) // 2))))
        return _pack(*out)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int,
                   modes: np.ndarray):
    tile_w = _sub_size(w, bits)
    out = px  # in place, int
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(out[i - 1])                      # L
        elif x == 0:
            pred = int(out[i - w])                      # T
        else:
            mode = (int(modes[(y >> bits) * tile_w + (x >> bits)])
                    >> 8) & 0xFF
            L = int(out[i - 1])
            T = int(out[i - w])
            TL = int(out[i - w - 1])
            TR = int(out[i - w + 1])
            pred = _predict(mode, L, T, TL, TR)
        v = int(out[i])
        out[i] = _pack(*[(a + b) & 0xFF for a, b in
                         zip(_unpack(v), _unpack(pred))])


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed(t) * signed(c) >> 5."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int,
                         elements: np.ndarray):
    tile_w = _sub_size(w, bits)
    for i in range(w * h):
        x, y = i % w, i // w
        e = int(elements[(y >> bits) * tile_w + (x >> bits)])
        g2r = e & 0xFF                # stored in blue channel
        g2b = (e >> 8) & 0xFF         # green channel
        r2b = (e >> 16) & 0xFF        # red channel
        v = int(px[i])
        a, r, g, b = _unpack(v)
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        px[i] = _pack(a, r, g, b)


def _inv_subtract_green(px: np.ndarray):
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) + g) & 0xFF
    b = ((px & 0xFF) + g) & 0xFF
    px[:] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_palette(px: np.ndarray, w: int, h: int, packed_w: int,
                 palette: np.ndarray) -> np.ndarray:
    n = len(palette)
    if n > 16:
        idx = (px >> 8) & 0xFF
        bad = idx >= n
        idx = np.where(bad, 0, idx)
        out = palette[idx]
        out[bad] = 0
        return out
    bpp = 1 if n <= 2 else 2 if n <= 4 else 4
    per = 8 // bpp
    mask = (1 << bpp) - 1
    packed = ((px >> 8) & 0xFF).reshape(h, packed_w)
    out = np.zeros((h, w), dtype=np.uint32)
    for k in range(per):
        cols = np.arange(k, w, per)
        src_idx = (packed[:, :len(cols)] >> (bpp * k)) & mask
        src_idx = np.minimum(src_idx, n - 1)
        out[:, cols] = palette[src_idx][:, :len(cols)]
    return out.ravel()


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

@malformed_input_guard('vp8l')
def decode_vp8l(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode a VP8L chunk body (starting with the 0x2f signature) to
    (h, w, 3) uint8 RGB — or (h, w, 4) RGBA with ``return_alpha``."""
    if payload[:1] != b"\x2f":
        raise ValueError("missing VP8L signature")
    br = _Reader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = decode_vp8l_raw(br, w, h)
    arr = argb.reshape(h, w)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if return_alpha:
        a = ((arr >> 24) & 0xFF).astype(np.uint8)
        return np.stack([r, g, b, a], axis=-1)
    return np.stack([r, g, b], axis=-1)


def decode_vp8l_raw(br: _Reader, w: int, h: int) -> np.ndarray:
    """Spatially-coded image with transforms -> flat uint32 ARGB (w*h)."""
    transforms = []                    # (type, data...) in read order
    cur_w = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:   # predictor / color
            bits = br.read(3) + 2
            sub = _decode_image(br, _sub_size(cur_w, bits),
                                _sub_size(h, bits))
            transforms.append((ttype, bits, sub, cur_w))
        elif ttype == 2:               # subtract green
            transforms.append((2,))
        else:                          # color indexing
            n = br.read(8) + 1
            pal_px = _decode_image(br, n, 1)
            pal = np.cumsum(
                pal_px.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                axis=0, dtype=np.uint32) & 0xFF
            palette = (pal[:, 3] << 24) | (pal[:, 2] << 16) | \
                      (pal[:, 1] << 8) | pal[:, 0]
            # little-endian uint32 view: byte0=b, 1=g, 2=r, 3=a
            orig_w = cur_w
            if n <= 2:
                cur_w = _sub_size(cur_w, 3)
            elif n <= 4:
                cur_w = _sub_size(cur_w, 2)
            elif n <= 16:
                cur_w = _sub_size(cur_w, 1)
            transforms.append((3, orig_w, cur_w, palette.astype(np.uint32)))

    cache_bits = br.read(4) if br.read(1) else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if br.read(1):                     # meta prefix image
        meta_bits = br.read(3) + 2
        meta_px = _decode_image(br, _sub_size(cur_w, meta_bits),
                                _sub_size(h, meta_bits))
        meta = (meta_px >> 8) & 0xFFFF
        n_groups = int(meta.max()) + 1
    groups = _read_groups(br, n_groups, cache_bits)
    px = _decode_pixels(br, cur_w, h, groups, meta, meta_bits, cache_bits)

    for t in reversed(transforms):
        if t[0] == 3:
            _, orig_w, packed_w, palette = t
            px = _inv_palette(px, orig_w, h, packed_w, palette)
            cur_w = orig_w
        elif t[0] == 2:
            _inv_subtract_green(px)
        elif t[0] == 1:
            _, bits, sub, t_w = t
            _inv_color_transform(px, t_w, h, bits, sub)
        else:
            _, bits, sub, t_w = t
            _inv_predictor(px, t_w, h, bits, sub)
    return px


# ---------------------------------------------------------------------------
# WebP alpha channel (ALPH chunk) — spec section 4.4 + libwebp filters.c
# ---------------------------------------------------------------------------

def _unfilter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Inverse of the WebP alpha prediction filters (in place)."""
    h, w = a.shape
    if method == 0:
        return a
    x = a.astype(np.int32)
    if method == 1:                       # horizontal
        for y in range(h):
            if y > 0:
                x[y, 0] += x[y - 1, 0]
            for c in range(1, w):
                x[y, c] += x[y, c - 1]
    elif method == 2:                     # vertical
        for c in range(1, w):             # first row: horizontal
            x[0, c] += x[0, c - 1]
        for y in range(1, h):
            x[y] += x[y - 1]
    elif method == 3:                     # gradient
        for y in range(h):
            for c in range(w):
                if y == 0:
                    pred = 0 if c == 0 else x[0, c - 1]
                elif c == 0:
                    pred = x[y - 1, 0]
                else:
                    g = int(x[y, c - 1]) + int(x[y - 1, c]) \
                        - int(x[y - 1, c - 1])
                    pred = 0 if g < 0 else 255 if g > 255 else g
                # wrap per pixel: the clamp above is nonlinear, so later
                # predictions must see the reconstructed byte value
                x[y, c] = (x[y, c] + pred) & 0xFF
    else:
        raise ValueError(f"bad alpha filter {method}")
    out = (x & 0xFF).astype(np.uint8)
    a[:] = out
    return a


@malformed_input_guard('vp8l')
def decode_alpha(alph_body: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk body to an (h, w) uint8 alpha plane."""
    if not alph_body:
        raise ValueError("empty ALPH chunk")
    head = alph_body[0]
    method = head & 0x3
    filter_m = (head >> 2) & 0x3
    # bits 4-5: pre-processing (level reduction) — encode-side only
    data = alph_body[1:]
    if method == 0:                       # raw
        if len(data) < w * h:
            raise ValueError("truncated raw alpha")
        a = np.frombuffer(data[:w * h], dtype=np.uint8).reshape(h, w).copy()
    elif method == 1:                     # lossless (headerless VP8L)
        br = _Reader(data)
        px = decode_vp8l_raw(br, w, h)
        a = ((px >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    else:
        raise ValueError(f"bad alpha compression method {method}")
    return _unfilter_alpha(a, filter_m)
