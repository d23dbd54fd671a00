"""RIFF/WAVE codec (pure Python/numpy) for the audio tier.

Decode: PCM 8 (unsigned) / 16 / 24 / 32-bit, IEEE float 32/64 (tag 3),
and IMA ADPCM (tag 0x11, mono + stereo, standard 4-byte block headers and
word-interleaved nibble layout).  Encode: 16-bit PCM and IMA ADPCM.
Perceptual codecs (mp3/opus/aac) raise NotImplementedError by format tag —
the honest-subset contract every codec module here follows.
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
    n_samples = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            codec = int.from_bytes(body[0:2], "little")
            if codec not in (1, 3, 0x11):
                raise NotImplementedError(
                    f"WAVE codec tag {codec:#x} needs an audio library "
                    f"(PCM/IEEE-float/IMA-ADPCM supported)")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif tag == b"fact":
            n_samples = int.from_bytes(body[0:4], "little")
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if ch is None or ch < 1:
        raise ValueError("invalid channel count")
    if codec == 0x11:
        arr = _decode_ima_adpcm(data, ch, block_align)
        if n_samples is not None:          # fact chunk: true length (the
            arr = arr[:n_samples]          # final block may be padded)
        return arr.astype(np.float64) / 32767.0, rate
    if codec == 3:
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE float WAVE")
        return arr.reshape(-1, ch), rate
    if bits == 8:
        # divide by 128 so byte 0 maps to exactly -1.0 (÷127 would leave
        # the documented [-1, 1] output range)
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32)
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float64) / float((1 << 23) - 1)
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483647.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return arr.reshape(-1, ch), rate


# -- IMA ADPCM (WAVE format tag 0x11) -----------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX[nibble & 7])))
    return pred, idx


def _decode_ima_adpcm(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """(n, ch) int16 samples from word-interleaved IMA ADPCM blocks."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch) != 0:
        raise ValueError(f"invalid IMA block align {block_align} for {ch}ch")
    chans: list[list[int]] = [[] for _ in range(ch)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0:b0 + block_align]
        preds, idxs = [], []
        for c in range(ch):
            h = block[c * 4:(c + 1) * 4]
            preds.append(int.from_bytes(h[0:2], "little", signed=True))
            idxs.append(min(88, h[2]))
            chans[c].append(preds[c])                # header carries sample 0
        body = block[4 * ch:]
        # data is interleaved in 4-byte words per channel
        for w0 in range(0, len(body), 4 * ch):
            for c in range(ch):
                word = body[w0 + c * 4:w0 + c * 4 + 4]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
    n = min(len(x) for x in chans)
    return np.stack([np.asarray(x[:n], dtype=np.int16) for x in chans], axis=1)


def encode_wav_ima(samples: np.ndarray, sample_rate: int = 16000,
                   samples_per_block: int = 505) -> bytes:
    """IMA-ADPCM WAVE encoder (fixture planting + round-trip testing)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0)             .round().astype(np.int16)
    n, ch = samples.shape
    if (samples_per_block - 1) % 8 != 0:
        raise ValueError("samples_per_block must be 8k+1")
    block_align = 4 * ch + (samples_per_block - 1) // 2 * ch
    # pad to whole blocks (standard practice: repeat the last sample)
    if n % samples_per_block:
        pad = samples_per_block - n % samples_per_block
        samples = np.vstack([samples, np.repeat(samples[-1:], pad, axis=0)])
    out = bytearray()
    for b0 in range(0, len(samples), samples_per_block):
        block = samples[b0:b0 + samples_per_block]
        preds = [int(block[0, c]) for c in range(ch)]
        # per-block initial step index: nearest table step to the mean
        # |sample delta| (what real encoders do — starting at index 0
        # cannot track a fast signal and audibly slews the first block)
        idxs = []
        for c in range(ch):
            mean_d = float(np.abs(np.diff(block[:, c].astype(np.int32)))
                           .mean()) if len(block) > 1 else 0.0
            idxs.append(int(np.abs(_IMA_STEPS - mean_d).argmin()))
        for c in range(ch):
            out += int(preds[c]).to_bytes(2, "little", signed=True)
            out += bytes([idxs[c], 0])
        nibs: list[list[int]] = [[] for _ in range(ch)]
        for c in range(ch):
            p, ix = preds[c], idxs[c]
            for s16 in block[1:, c]:
                step = int(_IMA_STEPS[ix])
                delta = int(s16) - p
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                p, ix = _ima_step(p, ix, nib)
                nibs[c].append(nib)
        # word-interleave: 8 nibbles (4 bytes) per channel alternating
        for w0 in range(0, len(nibs[0]), 8):
            for c in range(ch):
                grp = nibs[c][w0:w0 + 8]
                for k in range(0, 8, 2):
                    out.append(grp[k] | (grp[k + 1] << 4))
    byte_rate = sample_rate * block_align // samples_per_block
    fact = b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
    fmt = (b"fmt " + (20).to_bytes(4, "little")
           + (0x11).to_bytes(2, "little")
           + ch.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + block_align.to_bytes(2, "little")
           + (4).to_bytes(2, "little")
           + (2).to_bytes(2, "little")
           + samples_per_block.to_bytes(2, "little"))
    body = b"WAVE" + fmt + fact + b"data" \
        + len(out).to_bytes(4, "little") + bytes(out)
    if len(out) % 2:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body
