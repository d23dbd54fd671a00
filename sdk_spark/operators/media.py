"""Audio/video multimodal operators (Arrow-batched kernels; brief §media).

Same design as the image tier: payloads are opaque ``binary`` columns with
typed metadata; decode/feature-extract/resize/frame-sample run as
``mapInPandas`` kernels over Arrow batches (no per-row Python at the API
layer), and every kernel is a real implementation wherever a pure-Python
codec is feasible:

* **audio** — RIFF/WAVE 16-bit PCM decodes for REAL
  (``sdk_spark.functions.wav``); features = duration / RMS / peak /
  zero-crossing rate. Compressed codecs raise NotImplementedError by tag.
* **image resize** — REAL: decode (PNG/JPEG/WebP), nearest-neighbor resize
  in numpy, re-encode PNG. The batch shape is exactly what a
  libjpeg/Pillow-backed production kernel would use.
* **video frame-sample** — container codecs (h264/vp9) are not feasible in
  pure Python, so video uses a documented stand-in container ``RAWV``
  (frame count + concatenated PNG frames, ``encode_rawv``): the SAMPLING
  logic, schema, batching and partitioning are all real; only the inner
  per-frame decode call swaps out for a real demuxer in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("duration_sec", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.DoubleType(), True),
    T.StructField("zero_cross_rate", T.DoubleType(), True),
    T.StructField("decode_ok", T.BooleanType(), True),
])

RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), True),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), True),
    T.StructField("frame_index", T.IntegerType(), True),
    T.StructField("frame_png", T.BinaryType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def audio_features(df: DataFrame, id_col: str = "media_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Per-clip audio features from REAL PCM decode (one row per clip)."""
    cols = df.select(F.col(id_col).alias("media_id"), F.col(bytes_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.flac import decode_flac
        from ..functions.wav import decode_wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[bytes_col]):
                if payload is None:
                    rows.append((mid, None, None, None, None, None, None, False))
                    continue
                try:
                    raw = bytes(payload)
                    decode = decode_flac if raw[:4] == b"fLaC" else decode_wav
                    samples, rate = decode(raw)
                except (ValueError, NotImplementedError):
                    rows.append((mid, None, None, None, None, None, None, False))
                    continue
                if not rate or rate <= 0:
                    # a declared sample rate of 0 would ZeroDivisionError
                    # the duration below and abort the task — it is a
                    # malformed clip, not a crash
                    rows.append((mid, None, None, None, None, None, None, False))
                    continue
                mono = samples.mean(axis=1)
                zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) \
                    if len(mono) > 1 else 0.0
                rms = (float(np.sqrt(np.mean(mono ** 2)))
                       if len(mono) else 0.0)  # empty clip: 0, not NaN
                rows.append((mid, rate, samples.shape[1],
                             samples.shape[0] / rate,
                             rms,
                             float(np.max(np.abs(mono))) if len(mono) else 0.0,
                             zc, True))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURE_SCHEMA.fields])

    return cols.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "image_id",
                  bytes_col: str = "bytes",
                  out_fmt: str = "png") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (fully real); any
    ``multimodal.encode_image`` output format."""
    cols = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_image, encode_image

        for pdf in batches:
            rows = []
            for iid, payload in zip(pdf["image_id"], pdf[bytes_col]):
                if payload is None:
                    rows.append((iid, None, None, None))
                    continue
                try:
                    arr = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    rows.append((iid, None, None, None))
                    continue
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = arr[yi][:, xi]
                rows.append((iid, encode_image(resized, out_fmt),
                             out_w, out_h))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZE_SCHEMA.fields])

    return cols.mapInPandas(kernel, RESIZE_SCHEMA)


# -- video stand-in container ------------------------------------------------------

def encode_rawv(frames: list[np.ndarray]) -> bytes:
    """Stand-in video container: 'RAWV' + frame count + length-prefixed PNG
    frames. A real pipeline swaps this + the demux below for pyav/ffmpeg."""
    from ..functions.png import encode_png

    out = bytearray(b"RAWV")
    out += len(frames).to_bytes(4, "little")
    for f in frames:
        png = encode_png(f)
        out += len(png).to_bytes(4, "little") + png
    return bytes(out)


def _demux_rawv(payload: bytes) -> list[bytes]:
    if payload[:4] != b"RAWV":
        raise NotImplementedError(
            "real video containers (mp4/webm) need a demuxer library; "
            "only the RAWV stand-in decodes in this environment")
    n = int.from_bytes(payload[4:8], "little")
    frames = []
    pos = 8
    for _ in range(n):
        ln = int.from_bytes(payload[pos:pos + 4], "little")
        frames.append(payload[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    return frames


def sample_frames(df: DataFrame, every_n: int = 2,
                  id_col: str = "media_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Frame sampling: one output row per kept frame (index % every_n == 0),
    decoded for real — PNG frames in the RAWV stand-in container, or
    composited frames of an animated GIF (disposal methods applied by
    ``functions.gif.decode_gif_frames``; kept frames re-encode as PNG so
    the output ``bytes`` column is format-homogeneous)."""
    cols = df.select(F.col(id_col).alias("media_id"), F.col(bytes_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.gif import decode_gif_frames
        from ..functions.png import decode_png, encode_png

        def frames_of(payload: bytes) -> list[tuple[int, bytes, float]]:
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                gframes, _, _ = decode_gif_frames(payload)
                return [(idx, encode_png(gframes[idx]),
                         float(gframes[idx].mean()))
                        for idx in range(0, len(gframes), every_n)]
            if (payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
                    and payload[12:16] == b"VP8X" and len(payload) > 20
                    and payload[20] & 0x02):   # VP8X animation flag
                from ..functions.webp import decode_webp_frames

                wframes, _, _ = decode_webp_frames(payload)
                out = []
                for idx in range(0, len(wframes), every_n):
                    rgb = wframes[idx][..., :3]
                    out.append((idx, encode_png(rgb), float(rgb.mean())))
                return out
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                from ..functions.avi import decode_avi_frames
                from ..functions.jpeg import decode_jpeg

                jpegs, _, _ = decode_avi_frames(payload)
                out = []
                for idx in range(0, len(jpegs), every_n):
                    arr = decode_jpeg(jpegs[idx])
                    out.append((idx, encode_png(arr), float(arr.mean())))
                return out
            frames = _demux_rawv(payload)   # non-RAWV: NotImplementedError
            return [(idx, frames[idx], float(decode_png(frames[idx]).mean()))
                    for idx in range(0, len(frames), every_n)]

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[bytes_col]):
                if payload is None:
                    continue
                try:
                    got = frames_of(bytes(payload))
                except (ValueError, NotImplementedError):
                    # corrupt/truncated container (or a non-RAWV format):
                    # zero frames for this row — the same per-row
                    # degradation audio_features and resize_images apply,
                    # never a task abort
                    continue
                rows.extend((mid, idx, png, luma) for idx, png, luma in got)
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SAMPLE_SCHEMA.fields])

    return cols.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
