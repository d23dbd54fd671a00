"""Corruption-robustness fuzz: every codec fails CLOSED on malformed bytes.

The validation tier's contract (codec_util.malformed_input_guard): an
undecodable payload raises ValueError / NotImplementedError — which the
Arrow kernels turn into per-row violation rows — never a raw internal
exception (zlib.error, IndexError, StopIteration, ...) that would abort
the whole batch, and never a hang.  Deterministic corruption matrix:
prefix truncations at 7 depths + 40 single-bit flips at hash-spread
offsets, per format, plus cross-format header grafts.
"""
from __future__ import annotations

import signal

import numpy as np
import pytest

from sdk_spark.functions.bmp import encode_bmp
from sdk_spark.functions.ico import encode_ico
from sdk_spark.functions.pnm import encode_pnm
from sdk_spark.functions.qoi import encode_qoi
from sdk_spark.functions.tga import encode_tga
from sdk_spark.functions.gif import encode_gif, encode_gif_animation
from sdk_spark.functions.tiff import encode_tiff
from sdk_spark.functions.jpeg import encode_jpeg, encode_jpeg_progressive
from sdk_spark.functions.wav import decode_wav, encode_wav
from sdk_spark.functions.webp import encode_webp, encode_webp_animation
from sdk_spark.functions.png import encode_png
from sdk_spark.operators.multimodal import decode_image

RNG = np.random.default_rng(20260817)
_IMG = RNG.integers(0, 256, (24, 32, 3)).astype(np.uint8)
_COLS = RNG.integers(0, 256, (64, 3)).astype(np.uint8)
_COLS[:, 0] = np.arange(64)
_GIMG = _COLS[RNG.integers(0, 64, (24, 32))]

PAYLOADS = {
    "png": encode_png(_IMG),
    "jpeg": encode_jpeg(_IMG),
    "jpeg_restart": encode_jpeg(_IMG, restart_interval=2),
    "jpeg_prog": encode_jpeg_progressive(_IMG),
    "gif": encode_gif(_GIMG),
    "gif_interlaced": encode_gif(_GIMG, interlace=True),
    "gif_anim": encode_gif_animation([_GIMG, _GIMG], [5, 5]),
    "vp8l": encode_webp(_IMG),
    "vp8l_rgba": encode_webp(np.dstack([_IMG, _GIMG[..., 0]])),
    "webp_anim": encode_webp_animation([_IMG, _IMG], [5, 5]),
    "bmp": encode_bmp(_IMG),
    "tiff_lzw": encode_tiff(_IMG, compression=5, predictor=2,
                            rows_per_strip=8),
    "tiff_packbits": encode_tiff(_IMG, compression=32773, rows_per_strip=8),
    "ico_png": encode_ico(_IMG),
    "qoi": encode_qoi(_IMG),
    "pnm": encode_pnm(_IMG),
    "tga": encode_tga(_IMG),
}


def _mutations(p: bytes):
    for frac in (0.1, 0.25, 0.4, 0.55, 0.7, 0.85, 0.97):
        yield p[:int(len(p) * frac)]
    for i in range(40):
        pos = (i * 2654435761 + 17) % len(p)
        b = bytearray(p)
        b[pos] ^= 1 << (i % 8)
        yield bytes(b)
    yield p + p[:32]                       # trailing garbage


class _Timeout:
    """Hang guard: a corrupt length field must not spin the decoder."""

    def __enter__(self):
        signal.signal(signal.SIGALRM,
                      lambda *a: (_ for _ in ()).throw(
                          AssertionError("decoder hung on corrupt input")))
        signal.alarm(20)

    def __exit__(self, *exc):
        signal.alarm(0)


@pytest.mark.parametrize("fmt", sorted(PAYLOADS))
def test_corrupt_images_fail_closed(fmt):
    for case in _mutations(bytes(PAYLOADS[fmt])):
        with _Timeout():
            try:
                out = decode_image(case)
                assert isinstance(out, np.ndarray)   # tolerated corruption
            except (ValueError, NotImplementedError):
                pass                                  # the contract


def test_corrupt_ico_dib_fails_closed():
    from tests.test_ico import dib_ico

    for case in _mutations(dib_ico(_IMG[:16, :16])):
        with _Timeout():
            try:
                out = decode_image(case)
                assert isinstance(out, np.ndarray)
            except (ValueError, NotImplementedError):
                pass


def test_corrupt_flac_fails_closed():
    from sdk_spark.functions.flac import decode_flac, encode_flac

    pcm = (RNG.standard_normal(2000) * 8000).astype(np.int16)
    for case in _mutations(bytes(encode_flac(pcm, 8000, block_size=512))):
        with _Timeout():
            try:
                samples, rate = decode_flac(case)
                assert rate > 0
            except (ValueError, NotImplementedError):
                pass


def test_corrupt_adpcm_fails_closed():
    from sdk_spark.functions.wav import encode_wav_ima

    pcm = (RNG.standard_normal(3000) * 8000).astype(np.int16)
    for case in _mutations(bytes(encode_wav_ima(pcm, sample_rate=8000))):
        with _Timeout():
            try:
                samples, rate = decode_wav(case)
                assert isinstance(samples, np.ndarray) and rate > 0
            except (ValueError, NotImplementedError):
                pass


def test_corrupt_wav_fails_closed():
    pcm = (RNG.standard_normal(2000) * 8000).astype(np.int16)
    payload = encode_wav(pcm, sample_rate=16000)
    for case in _mutations(bytes(payload)):
        with _Timeout():
            try:
                samples, rate = decode_wav(case)
                assert isinstance(samples, np.ndarray) and rate > 0
            except (ValueError, NotImplementedError):
                pass


def test_corrupt_avi_fails_closed():
    from sdk_spark.functions.avi import decode_avi_frames, encode_avi_mjpeg

    jpeg = bytes(PAYLOADS["jpeg"])
    avi = encode_avi_mjpeg([jpeg, jpeg], 32, 24)
    for case in _mutations(avi):
        with _Timeout():
            try:
                frames, fps, dims = decode_avi_frames(case)
                assert frames and fps > 0
            except (ValueError, NotImplementedError):
                pass


def test_header_grafts_fail_closed():
    """A header of one format glued to the body of another."""
    names = sorted(PAYLOADS)
    for a in names:
        for b in names:
            if a == b:
                continue
            graft = bytes(PAYLOADS[a])[:16] + bytes(PAYLOADS[b])[16:]
            with _Timeout():
                try:
                    decode_image(graft)
                except (ValueError, NotImplementedError):
                    pass


def test_exif_fuzz_fails_closed():
    from sdk_spark.functions.exif import build_exif_tiff, extract_exif, \
        inject_jpeg_exif

    tagged = inject_jpeg_exif(bytes(PAYLOADS["jpeg"]),
                              build_exif_tiff(6, 4032, 3024))
    for case in _mutations(tagged):
        with _Timeout():
            try:
                meta = extract_exif(case)
                assert meta is None or isinstance(meta, dict)
            except (ValueError, NotImplementedError):
                pass
