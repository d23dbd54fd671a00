"""Baseline TIFF codec in pure Python/numpy (TIFF 6.0 subset).

Decoder: both byte orders, stripped chunky images; Compression 1 (none),
5 (LZW with early-change code widths and horizontal Predictor 2) and
32773 (PackBits); PhotometricInterpretation 0/1 (bilevel+gray, min-is-
white inverted), 2 (RGB, 3 or 4 samples) and 3 (palette via ColorMap);
BitsPerSample 1 (bilevel) or 8 per sample; RowsPerStrip defaulting to
the image height.  Tiled TIFFs, planar configuration 2, and >8-bit
samples raise by feature name.

Encoder: chunky RGB/gray with Compression 1, 5 or 32773 (+ optional
predictor), multiple strips — fixtures for the decoder and for the
cross-validation against libtiff (via libgd) in tests/test_bmp_tiff.py.

Reference parity note: the json-structure reference SDK contains no
image codecs; this module serves the engine's multimodal decode-breadth
tier (fail-closed via codec_util, like every other format).
"""
from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_tag_values(data: bytes, e: int, bo: str) -> list[int] | None:
    typ = int.from_bytes(data[e + 2:e + 4], bo)
    cnt = int.from_bytes(data[e + 4:e + 8], bo)
    if typ not in (1, 3, 4):
        return None
    size = _TYPE_SIZES[typ]
    total = size * cnt
    if total <= 4:
        raw = data[e + 8:e + 8 + total]
    else:
        off = int.from_bytes(data[e + 8:e + 12], bo)
        raw = data[off:off + total]
    if len(raw) < total:
        raise ValueError("truncated TIFF tag values")
    return [int.from_bytes(raw[i * size:(i + 1) * size], bo)
            for i in range(cnt)]


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytearray:
    """TIFF-variant LZW: MSB-first packing, EARLY code-width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out                  # missing EOI: tolerate
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == EOI:
            return out
        if code < len(table) and (code >= 258 or code < 256):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream (code out of range)")
        out.extend(entry)
        if len(out) > max_out:
            raise ValueError("TIFF LZW output exceeds strip size")
        if prev is not None:
            table.append(prev + entry[:1])
            # EARLY change (one code before the GIF convention): widen
            # when the table reaches 2^width - 1 entries — pinned against
            # libtiff-encoded streams in tests/test_bmp_tiff.py
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        # encoder runs one entry ahead of the decoder: widen when the
        # just-assigned entry is 2^width - 1 (libtiff emits that entry's
        # successor codes at the larger width)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((EOI, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytearray:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < max_out:
        h = data[pos]
        pos += 1
        if h < 128:                         # literal run of h+1
            if pos + h + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out.extend(data[pos:pos + h + 1])
            pos += h + 1
        elif h == 128:                      # no-op
            continue
        else:                               # repeat next byte 257-h times
            if pos >= n:
                raise ValueError("truncated PackBits repeat run")
            out.extend(bytes([data[pos]]) * (257 - h))
            pos += 1
    return out


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        lit_start = i
        i += 1
        while i < n and (i - lit_start) < 128:
            if i + 1 < n and row[i] == row[i + 1]:
                break
            i += 1
        out.append(i - lit_start - 1)
        out.extend(row[lit_start:i])
    return bytes(out)


@malformed_input_guard("tiff")
def decode_tiff(payload: bytes, return_alpha: bool = False) -> np.ndarray:
    """Decode the first IFD of a TIFF to (h, w, 3) RGB (or RGBA)."""
    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF (missing II/MM byte-order mark)")
    if int.from_bytes(payload[2:4], bo) != 42:
        raise ValueError("not a TIFF (bad magic)")
    ifd = int.from_bytes(payload[4:8], bo)
    if ifd + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    n_tags = int.from_bytes(payload[ifd:ifd + 2], bo)
    if ifd + 2 + 12 * n_tags > len(payload):
        raise ValueError("truncated TIFF IFD entries")
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        e = ifd + 2 + 12 * i
        tag = int.from_bytes(payload[e:e + 2], bo)
        vals = _read_tag_values(payload, e, bo)
        if vals is not None:
            tags[tag] = vals

    for feature, tag in (("tiles", 322), ("tiles", 323)):
        if tag in tags:
            raise NotImplementedError(f"tiff feature not supported: {feature}")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("tiff feature not supported: planar config 2")

    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        raise ValueError("TIFF dimensions out of range")
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    predictor = tags.get(317, [1])[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    rows_per_strip = tags.get(278, [h])[0] or h
    if offsets is None:
        raise ValueError("TIFF missing StripOffsets")
    if counts is None:
        counts = [len(payload) - offsets[0]]
    if len(offsets) != len(counts):
        raise ValueError("TIFF StripOffsets/StripByteCounts mismatch")

    bilevel = bps == [1] and spp == 1
    if not bilevel and any(b != 8 for b in bps):
        raise NotImplementedError(
            f"tiff feature not supported: {bps} bits per sample")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"tiff feature not supported: photometric {photo}")

    row_bytes = (w * spp) if not bilevel else (w + 7) // 8
    data = bytearray()
    for strip_i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - strip_i * rows_per_strip)
        if strip_rows <= 0:
            break
        need = row_bytes * strip_rows
        raw = payload[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("truncated TIFF strip")
        if comp == 1:
            dec = raw
        elif comp == 5:
            dec = _lzw_decode_tiff(raw, need)
        elif comp in (8, 32946):            # Deflate (Adobe + legacy ids)
            import zlib

            dec = zlib.decompress(bytes(raw))
        elif comp == 32773:
            dec = _packbits_decode(raw, need)
        else:
            raise NotImplementedError(
                f"tiff feature not supported: compression {comp}")
        if len(dec) < need:
            raise ValueError("TIFF strip shorter than declared rows")
        data.extend(dec[:need])

    if len(data) < row_bytes * h:
        raise ValueError("TIFF strips do not cover the image")
    arr = np.frombuffer(bytes(data[:row_bytes * h]),
                        dtype=np.uint8).reshape(h, row_bytes)

    if bilevel:
        bits = np.unpackbits(arr, axis=1)[:, :w]
        gray = np.where(bits == 1, 0 if photo == 0 else 255,
                        255 if photo == 0 else 0).astype(np.uint8)
        rgb = np.stack([gray] * 3, axis=-1)
        alpha = np.full((h, w), 255, np.uint8)
    else:
        px = arr.reshape(h, w, spp)
        if predictor == 2:
            px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
        elif predictor != 1:
            raise NotImplementedError(
                f"tiff feature not supported: predictor {predictor}")
        alpha = np.full((h, w), 255, np.uint8)
        if photo in (0, 1):
            gray = px[:, :, 0]
            if photo == 0:
                gray = 255 - gray
            rgb = np.stack([gray] * 3, axis=-1)
        elif photo == 3:
            cmap = tags.get(320)
            if cmap is None:
                raise ValueError("palette TIFF missing ColorMap")
            ncol = len(cmap) // 3
            pal = (np.array(cmap, dtype=np.uint32)
                   .reshape(3, ncol).T // 257).astype(np.uint8)
            idx = px[:, :, 0]
            if int(idx.max(initial=0)) >= ncol:
                raise ValueError("TIFF palette index out of range")
            rgb = pal[idx]
        else:                               # photometric 2: RGB(A)
            if spp < 3:
                raise ValueError("RGB TIFF with <3 samples per pixel")
            rgb = px[:, :, :3].copy()
            if spp >= 4:
                alpha = px[:, :, 3].copy()
    return np.dstack([rgb, alpha]) if return_alpha else rgb


def encode_tiff(arr: np.ndarray, compression: int = 1,
                rows_per_strip: int | None = None,
                predictor: int = 1, byte_order: str = "little") -> bytes:
    """Encode (h, w, 3) RGB or (h, w) gray uint8 as a stripped TIFF."""
    bo = byte_order
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_tiff expects (h, w, 3) RGB or (h, w) gray")
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    rows_per_strip = rows_per_strip or h
    px = arr.reshape(h, w, spp)
    if predictor == 2:
        d = px.astype(np.int16)
        d[:, 1:] -= px[:, :-1].astype(np.int16)
        px = (d % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = px[y0:y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 8:
            import zlib

            strips.append(zlib.compress(raw, 6))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError("compression must be 1, 5, 8 or 32773")

    def tag(tid: int, typ: int, vals: list[int]) -> tuple[bytes, bytes]:
        size = _TYPE_SIZES[typ]
        total = size * len(vals)
        raw = b"".join(v.to_bytes(size, bo) for v in vals)
        head = (tid.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + len(vals).to_bytes(4, bo))
        if total <= 4:
            return head + raw.ljust(4, b"\x00"), b""
        return head, raw                    # offset patched later

    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
        (259, 3, [compression]), (262, 3, [1 if gray else 2]),
        (273, 4, [0] * len(strips)),        # patched
        (277, 3, [spp]), (278, 4, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((317, 3, [2]))
    entries.sort()

    mark = b"II" if bo == "little" else b"MM"
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    built = []
    ext_blobs = []
    for tid, typ, vals in entries:
        head, ext = tag(tid, typ, vals)
        if ext:
            head = head + ext_off.to_bytes(4, bo)
            ext_blobs.append(ext)
            ext_off += len(ext)
        built.append((tid, typ, vals, head))
    strip_base = ext_off
    strip_offsets = []
    pos = strip_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # rebuild the StripOffsets entry with real offsets
    out_entries = []
    ext_iter = iter(ext_blobs)
    rebuilt_ext = []
    ext_off2 = ifd_off + ifd_size
    for tid, typ, vals, head in built:
        if tid == 273:
            vals = strip_offsets
        size = _TYPE_SIZES[typ]
        total = size * len(vals)
        raw = b"".join(v.to_bytes(size, bo) for v in vals)
        head = (tid.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + len(vals).to_bytes(4, bo))
        if total <= 4:
            out_entries.append(head + raw.ljust(4, b"\x00"))
        else:
            out_entries.append(head + ext_off2.to_bytes(4, bo))
            rebuilt_ext.append(raw)
            ext_off2 += len(raw)
    ifd = (len(entries).to_bytes(2, bo) + b"".join(out_entries)
           + (0).to_bytes(4, bo))
    return (mark + (42).to_bytes(2, bo) + ifd_off.to_bytes(4, bo)
            + ifd + b"".join(rebuilt_ext) + b"".join(strips))
