"""Minimal RIFF/WAVE PCM codec (pure Python/numpy) for the audio tier.

16-bit PCM mono/stereo encode + decode — WAV is simple enough that the
audio path needs no stub: real container parsing, real samples. Compressed
codecs (mp3/opus/aac) would slot behind the same two functions; they raise
NotImplementedError by format tag.
"""

from __future__ import annotations

import numpy as np

from .codec_util import malformed_input_guard


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """samples: float in [-1, 1] or int16; shape (n,) or (n, channels)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).round().astype(np.int16)
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")            # PCM
           + ch.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little")       # block align
           + (16).to_bytes(2, "little"))          # bits per sample
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


@malformed_input_guard('wav')
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples float64 in [-1,1], shape (n, channels)), rate."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    ch = None
    bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            codec = int.from_bytes(body[0:2], "little")
            if codec != 1:
                raise NotImplementedError(
                    f"non-PCM WAVE codec tag {codec} needs an audio library")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM not supported (16 only)")
    arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    return arr.reshape(-1, ch), rate
