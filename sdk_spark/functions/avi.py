"""AVI container (RIFF) with MJPEG video — a REAL video demux path.

Motion-JPEG AVI is the simplest real-world video interchange format:
every frame is a standalone baseline JPEG inside '00dc' chunks of the
'movi' LIST.  With the engine's own JPEG codec (baseline + progressive,
validated elsewhere), this gives genuine end-to-end video frame
sampling without any codec library — unlike mp4/webm, whose codecs
(h264/vp9) are out of scope and raise by name at the dispatch layer.

Decoder: walks RIFF/LIST structure, reads the main ('avih') and stream
('strh'/'strf') headers, collects '00dc'/'00db' frame chunks (index
optional — streaming writers omit 'idx1').  Encoder: writes a spec-
complete file including the idx1 index.

Reference parity note: the json-structure reference SDK has no media
handling; this module serves the engine's multimodal tier.
"""
from __future__ import annotations

from .codec_util import malformed_input_guard


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + len(body).to_bytes(4, "little") + body + \
        (b"\x00" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames_jpeg: list[bytes], w: int, h: int,
                     fps: int = 25) -> bytes:
    """Length-prefixed baseline-JPEG frames -> a complete MJPEG AVI."""
    if not frames_jpeg:
        raise ValueError("no frames")
    n = len(frames_jpeg)
    max_bytes = max(len(f) for f in frames_jpeg)

    avih = b"".join(v.to_bytes(4, "little") for v in [
        1_000_000 // fps,       # microseconds per frame
        max_bytes * fps,        # max bytes per second
        0,                      # padding granularity
        0x10,                   # flags: AVIF_HASINDEX
        n,                      # total frames
        0,                      # initial frames
        1,                      # streams
        max_bytes,              # suggested buffer size
        w, h, 0, 0, 0, 0])

    strh = b"vidsMJPG" + b"".join(v.to_bytes(4, "little") for v in [
        0, 0, 0,                # flags, prio+lang, initial frames
        1, fps,                 # scale, rate -> fps
        0, n,                   # start, length (frames)
        max_bytes, 0xFFFFFFFF,  # buffer size, quality (-1)
        0]) + (0).to_bytes(2, "little") * 4      # sample size + rcFrame

    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + b"MJPG"
            + (w * h * 3).to_bytes(4, "little")
            + (0).to_bytes(4, "little") * 4)

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_entries = []
    idx_entries = []
    offset = 4                              # relative to 'movi' fourcc
    for f in frames_jpeg:
        movi_entries.append(_chunk(b"00dc", f))
        idx_entries.append(b"00dc" + (0x10).to_bytes(4, "little")
                           + offset.to_bytes(4, "little")
                           + len(f).to_bytes(4, "little"))
        offset += 8 + len(f) + (len(f) & 1)
    movi = _list(b"movi", b"".join(movi_entries))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


@malformed_input_guard("avi")
def decode_avi_frames(payload: bytes):
    """AVI -> (jpeg_frames, fps, (w, h)).  MJPEG ('MJPG'/'mjpg'/'dmb1')
    streams demux to their JPEG payloads; other codecs raise by fourcc."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    fps = None
    dims = None
    codec = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, dims, codec
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if pos + 8 + size > end:
                raise ValueError("truncated AVI chunk")
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + size)
            elif tag == b"strh" and size >= 32:
                if payload[body_start:body_start + 4] == b"vids":
                    codec = payload[body_start + 4:body_start + 8]
                    scale = int.from_bytes(
                        payload[body_start + 20:body_start + 24], "little")
                    rate = int.from_bytes(
                        payload[body_start + 24:body_start + 28], "little")
                    if scale:
                        fps = rate // scale
            elif tag == b"strf" and size >= 24 and dims is None:
                dims = (int.from_bytes(
                            payload[body_start + 4:body_start + 8],
                            "little", signed=True),
                        abs(int.from_bytes(
                            payload[body_start + 8:body_start + 12],
                            "little", signed=True)))
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(payload[body_start:body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(payload))
    if codec is not None and codec.upper() not in (b"MJPG", b"DMB1"):
        raise NotImplementedError(
            f"avi codec not supported: {codec.decode(errors='replace')}")
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, fps or 25, dims or (0, 0)
