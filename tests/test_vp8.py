"""VP8 (lossy WebP) decoder conformance: bit-exact vs libwebp.

Every case encodes a deterministic synthetic image with the *system*
libwebp (the external reference codec) and asserts the pure-Python
decoder reproduces libwebp's own YUV reconstruction **bit-exactly** —
including segmentation, coefficient-probability updates, all intra
modes, token partitions, and the in-loop deblocking filter.  This
externally validates every extracted spec table byte and filter branch,
a far stronger check than round-trip self-consistency.
"""
from __future__ import annotations

import numpy as np
import pytest

from tests import libwebp_ref as R

pytestmark = pytest.mark.skipif(
    not R.HAVE_LIBWEBP, reason="system libwebp not available")


def _img(kind: str, w: int, h: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    xx = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    yy = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    if kind == "flat":
        return np.full((h, w, 3), 130, dtype=np.uint8)
    if kind == "grad":
        return np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.uint8)
    if kind == "smooth":
        base = np.zeros((h, w, 3))
        for k in range(1, 4):
            for ch in range(3):
                base[..., ch] += rng.uniform(20, 60) * np.sin(
                    2 * np.pi * k * xx / w + rng.uniform(0, 6.3)) * np.cos(
                    2 * np.pi * k * yy / h + rng.uniform(0, 6.3))
        return np.clip(base + 128, 0, 255).astype(np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "blocks":
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for i in range(0, h, 8):
            for j in range(0, w, 8):
                out[i:i + 8, j:j + 8] = rng.integers(0, 256, 3)
        return out
    raise ValueError(kind)


def _assert_bit_exact(data: bytes):
    from sdk_spark.functions import vp8

    payload = R.vp8_chunk(data)
    ref_y, ref_u, ref_v = R.decode_yuv(data)
    my_y, my_u, my_v = vp8.decode_vp8_yuv(payload)
    for name, mine, ref in (("Y", my_y, ref_y), ("U", my_u, ref_u),
                            ("V", my_v, ref_v)):
        assert mine.shape == ref.shape, name
        bad = int((mine != ref).sum())
        assert bad == 0, f"{name}: {bad}/{ref.size} pixels differ"
    return vp8.parse_header(payload)


# (kind, w, h, quality) — spans flat/DC, gradients (B_PRED directional
# modes), texture, noise, non-multiple-of-16 dims, q from 1 to 100
# (filter levels 0..63, hev thresholds 0/1/2, segmentation on/off)
MATRIX = [
    ("flat", 16, 16, 90),
    ("grad", 16, 16, 100),
    ("grad", 64, 64, 90),
    ("smooth", 64, 64, 90),
    ("blocks", 64, 64, 90),
    ("noise", 32, 32, 90),
    ("smooth", 128, 96, 75),
    ("blocks", 80, 48, 50),
    ("grad", 33, 17, 90),
    ("smooth", 47, 31, 95),
    ("blocks", 16, 16, 10),
    ("smooth", 96, 96, 1),
]


@pytest.mark.parametrize("kind,w,h,q", MATRIX)
def test_bit_exact_simple_api(kind, w, h, q):
    _assert_bit_exact(R.encode_rgb(_img(kind, w, h), q))


def test_bit_exact_simple_loop_filter():
    h = _assert_bit_exact(R.encode_rgb_advanced(
        _img("smooth", 96, 80), 60, filter_type=0, filter_strength=40,
        autofilter=0))
    assert h.filter_simple == 1


def test_bit_exact_sharpness():
    h = _assert_bit_exact(R.encode_rgb_advanced(
        _img("smooth", 96, 80), 25, filter_sharpness=7,
        filter_strength=90))
    assert h.sharpness == 7


def test_bit_exact_multi_partition():
    h = _assert_bit_exact(R.encode_rgb_advanced(
        _img("blocks", 128, 96), 50, partitions=3, low_memory=1))
    assert h.num_parts == 8


def test_bit_exact_no_segments():
    h = _assert_bit_exact(R.encode_rgb_advanced(
        _img("smooth", 96, 80), 70, segments=1))
    assert h.seg_enabled == 0


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255.0 ** 2 / mse)


def test_rgb_psnr_vs_original():
    """North-rule invariant: decoded RGB within PSNR >= 40 dB of the
    pre-encode pixels at high quality (the lossy-decode validation the
    image tier applies per row).  Uses a luma-dominant fixture: on
    chroma-saturated content the 4:2:0 subsample itself caps PSNR in
    the low 30s for *any* conformant codec (libwebp's own RGB decode
    measures identically) — that is encode loss, not decode loss."""
    from sdk_spark.functions.webp import decode_webp

    g = _img("smooth", 96, 80)[..., :1]
    img = np.repeat(g, 3, axis=-1)       # grayscale -> minimal chroma
    out = decode_webp(R.encode_rgb(img, 95))
    assert out.shape == img.shape
    assert _psnr(out, img) >= 40.0


def test_rgb_matches_libwebp_rgb():
    """Content-independent decode-fidelity check: my RGB vs libwebp's
    own RGB conversion of the identical (bit-exact) YUV planes — only
    upsampling/rounding conventions differ."""
    import ctypes

    R.lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    from sdk_spark.functions import vp8

    img = _img("smooth", 96, 80)
    data = R.encode_rgb(img, 90)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = R.lib.WebPDecodeRGB(data, ctypes.c_size_t(len(data)),
                            ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 3)).copy()
    R.lib.WebPFree(p)
    mine = vp8.decode_vp8_rgb(R.vp8_chunk(data))
    assert _psnr(mine, ref) >= 50.0


def test_decode_image_dispatch():
    from sdk_spark.operators.multimodal import decode_image

    img = _img("grad", 32, 32)
    out = decode_image(R.encode_rgb(img, 95))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_vp8x_container_walks_to_vp8():
    """Extended container without alpha: skip VP8X header to the VP8
    chunk."""
    from sdk_spark.functions.webp import decode_webp

    data = R.encode_rgb(_img("grad", 32, 32), 95)
    vp8 = R.vp8_chunk(data)
    w, h = 32, 32
    flags = bytes([0, 0, 0, 0])
    canvas = (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + flags + canvas
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
    if len(vp8) % 2:
        chunk += b"\x00"
    body = b"WEBP" + vp8x + chunk
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    out = decode_webp(wrapped)
    assert out.shape == (32, 32, 3)


def test_lossy_alpha_decodes_exactly():
    """VP8X + ALPH + VP8: the alpha plane decodes bit-exactly vs
    libwebp's own RGBA output (lossless-compressed alpha, prediction
    filters inverted per libwebp filters.c)."""
    import ctypes

    R.lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    R.lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    from sdk_spark.functions.webp import decode_webp

    h, w = 70, 100
    xx = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    yy = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = xx
    img[..., 1] = yy
    img[..., 2] = (xx + yy) / 2
    img[..., 3] = np.clip(128 + 90 * np.sin(xx / 15) * np.cos(yy / 11),
                          0, 255)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = R.lib.WebPEncodeRGBA(img.tobytes(), w, h, w * 4,
                             ctypes.c_float(80.0), ctypes.byref(out))
    data = ctypes.string_at(out, n)
    R.lib.WebPFree(out)
    w2 = ctypes.c_int()
    h2 = ctypes.c_int()
    p = R.lib.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                             ctypes.byref(w2), ctypes.byref(h2))
    ref = np.ctypeslib.as_array(p, shape=(h2.value, w2.value, 4)).copy()
    R.lib.WebPFree(p)
    mine = decode_webp(data, return_alpha=True)
    assert mine.shape == (h, w, 4)
    assert (mine[..., 3] == ref[..., 3]).all()          # alpha bit-exact
    assert (mine[..., :3] == decode_webp(data)).all()   # rgb consistent


def test_frameless_animation_rejected():
    # animated WebP now decodes (tests/test_webp_anim.py); a container
    # with an ANIM chunk but no image frames must still fail closed
    from sdk_spark.functions.webp import decode_webp

    anim = b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    body = b"WEBP" + anim
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(ValueError, match="missing VP8L/VP8"):
        decode_webp(wrapped)


def test_interframe_rejected():
    from sdk_spark.functions import vp8

    data = bytearray(R.vp8_chunk(R.encode_rgb(_img("flat", 16, 16), 90)))
    data[0] |= 1  # flip the key-frame bit
    with pytest.raises((NotImplementedError, ValueError)):
        vp8.parse_header(bytes(data))


def test_corrupt_payloads():
    from sdk_spark.functions import vp8

    with pytest.raises(ValueError):
        vp8.parse_header(b"\x00" * 4)
    good = R.vp8_chunk(R.encode_rgb(_img("flat", 16, 16), 90))
    bad = bytearray(good)
    bad[3:6] = b"\x00\x00\x00"  # start code
    with pytest.raises(ValueError):
        vp8.parse_header(bytes(bad))


def test_extracted_tables_shapes():
    """Spec-table sanity independent of libwebp presence at runtime."""
    from sdk_spark.functions import vp8_tables as t

    assert t.COEFF_PROBS.shape == (4, 8, 3, 11)
    assert (t.COEFF_PROBS[0, 0] == 128).all()      # never-coded band
    assert t.COEFF_UPDATE_PROBS.shape == (4, 8, 3, 11)
    assert t.COEFF_UPDATE_PROBS.min() >= 1
    assert t.KF_BMODE_PROBS.shape == (10, 10, 9)
    assert list(t.ZIGZAG) == [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10,
                              7, 11, 14, 15]
    assert int(t.DC_QLOOKUP[-1]) == 157 and int(t.AC_QLOOKUP[-1]) == 284


# ---------------------------------------------------------------------------
# encoder (vp8enc): closed-loop, cross-validated by libwebp decoding the
# streams to exactly the same planes as the engine decoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind,w,h,q", [
    ("grad", 60, 44, 85),
    ("grad", 33, 17, 95),
    ("smooth", 64, 48, 70),
    ("flat", 16, 16, 50),
    ("noise", 32, 32, 90),
])
def test_encoder_streams_decode_identically_on_libwebp(kind, w, h, q):
    from sdk_spark.functions import vp8
    from sdk_spark.functions.vp8enc import encode_webp_lossy

    img = _img(kind, w, h)
    data = encode_webp_lossy(img, q)
    ref_y, ref_u, ref_v = R.decode_yuv(data)
    my_y, my_u, my_v = vp8.decode_vp8_yuv(R.vp8_chunk(data))
    for name, mine, ref in (("Y", my_y, ref_y), ("U", my_u, ref_u),
                            ("V", my_v, ref_v)):
        assert (mine == ref).all(), name


def test_encoder_psnr_at_high_quality():
    from sdk_spark.functions.vp8enc import encode_webp_lossy
    from sdk_spark.functions.webp import decode_webp

    img = _img("grad", 60, 44)
    out = decode_webp(encode_webp_lossy(img, 95))
    assert _psnr(out, img) >= 40.0


def test_encoder_no_libwebp_needed():
    """The encoder/decoder pair is self-contained (no codec library):
    round-trip through the pure-Python path only."""
    from sdk_spark.functions.vp8enc import encode_webp_lossy
    from sdk_spark.operators.multimodal import decode_image

    img = _img("grad", 48, 32)
    out = decode_image(encode_webp_lossy(img, 92))
    assert out.shape == img.shape
    assert _psnr(out, img) >= 35.0


def test_generator_lossy_webp_rows(spark):
    """generate_images(lossy_webp_fraction=...) plants real VP8 rows and
    the image job's PSNR invariant still separates planted from clean."""
    from sdk_spark.sources.images import generate_images
    from sdk_spark.plans.image_job import validate_images

    df = generate_images(spark, 60, partitions=2, webp_fraction=0.5,
                         lossy_webp_fraction=0.8)
    rows = df.select("image_id", "bytes", "fmt").collect()
    lossy = [r for r in rows
             if r["fmt"] == "webp" and bytes(r["bytes"][12:16]) == b"VP8 "]
    assert lossy, "no lossy rows planted"
    res = validate_images(df, check_pixels=True)
    viol = res.violations.collect()
    # planted mutations are still caught; no spurious PSNR violations on
    # clean lossy rows (ids ending in planted slots are the only ones)
    from sdk_spark.sources.images import expected_violation_ids
    pixel_viol = {r["image_id"] for r in viol
                  if r["constraint_id"] == "ENGINE_PIXEL_MISMATCH"}
    from sdk_spark.sources.images import canonical_id
    planted_content = {canonical_id(i) for i in range(60)
                       if i % 100 in (9, 10)}
    unexpected = pixel_viol - planted_content
    assert not unexpected, f"spurious pixel violations: {unexpected}"
