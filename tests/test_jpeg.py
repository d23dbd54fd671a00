"""Baseline JPEG codec + lossy-tier invariants on a mixed-format table.

The north-rule input says ``fmt ∈ {png, jpeg, webp}`` with decoded-pixel
PSNR≥40dB as the per-row invariant *for lossy formats* — these tests prove
the invariant end-to-end on real JPEG payloads, not just PNG.
"""

from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.jpeg import decode_jpeg, encode_jpeg
from sdk_spark.functions.png import psnr


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 3 + yy * 2) % 256, (xx + yy * 5) % 256,
                     np.full((h, w), 77)], axis=2).astype(np.uint8)


def test_roundtrip_psnr_by_content():
    solid = np.full((13, 9, 3), 123, dtype=np.uint8)
    assert psnr(decode_jpeg(encode_jpeg(solid, 95)), solid) == np.inf
    grad = _gradient(21, 17)
    assert psnr(decode_jpeg(encode_jpeg(grad, 95)), grad) >= 45
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    # pure noise is the hard case: quality 95 keeps it mid-30s dB — enough
    # to prove the codec is faithful but legitimately below lossless
    assert 25 <= psnr(decode_jpeg(encode_jpeg(noise, 95)), noise) < 50


def test_grayscale_and_odd_dims():
    g = (np.arange(23 * 11).reshape(23, 11) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, 95))
    assert dec.shape == (23, 11, 3)
    assert psnr(dec, np.stack([g] * 3, axis=-1)) >= 40
    one = np.full((1, 1, 3), 200, dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(one)).shape == (1, 1, 3)


def test_header_structure_and_rejections():
    grad = _gradient(8, 8)
    payload = encode_jpeg(grad)
    assert payload[:2] == b"\xFF\xD8" and payload[-2:] == b"\xFF\xD9"
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")  # no SOF/SOS


def test_decode_image_dispatch():
    from sdk_spark.operators.multimodal import decode_image
    from sdk_spark.functions.png import encode_png

    grad = _gradient(10, 10)
    assert psnr(decode_image(encode_jpeg(grad, 95)), grad) >= 40
    assert np.array_equal(decode_image(encode_png(grad)), grad)
    # lossy VP8 is now a real decoder (test_vp8.py); a truncated VP8
    # chunk is a malformed payload, not a missing feature
    lossy_vp8 = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
                 + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_image(lossy_vp8, fmt="webp")


def test_mixed_format_invariants_on_spark(spark):
    """pixel_caption_invariants over a 30%-JPEG planted table: exactly the
    planted pixel/caption defects are flagged; clean JPEG rows pass the
    40 dB bar."""
    from sdk_spark.operators.multimodal import pixel_caption_invariants
    from sdk_spark.sources.images import expected_violation_ids, generate_images

    n = 300
    df = generate_images(spark, n, partitions=4, jpeg_fraction=0.3,
                         webp_fraction=0.3)
    fmts = {r["fmt"] for r in df.select("fmt").distinct().collect()}
    assert {"jpeg", "png", "webp"} <= fmts

    viol = pixel_caption_invariants(df).collect()
    got_pixel = {r["image_id"] for r in viol
                 if r["constraint_id"] == "ENGINE_PIXEL_MISMATCH"}
    got_caption = {r["image_id"] for r in viol
                   if r["constraint_id"] == "ENGINE_CAPTION_MISMATCH"}
    from sdk_spark.sources.images import canonical_id

    exp = expected_violation_ids(n)
    exp_pixel = {canonical_id(i) for i in exp["pixel"]}
    # every planted caption mutation (empty / NUL-injected / reference-
    # mutated) differs from the reference caption, so all three classes
    # are legitimate ENGINE_CAPTION_MISMATCH rows
    exp_caption = {canonical_id(i) for i in
                   exp["cap_ref"] + exp["cap_minlen"] + exp["cap_pattern"]}
    assert got_pixel == exp_pixel
    assert got_caption == exp_caption


def test_webp_codec_roundtrip():
    """VP8L lossless: exact pixel equality, structural header checks,
    subset rejections (no reference codec in this container — conformance
    is round-trip + structural; see functions/webp.py caveat)."""
    import numpy as np
    import pytest as _pytest

    from sdk_spark.functions.webp import decode_webp, encode_webp

    yy, xx = np.mgrid[0:21, 0:17]
    grad = np.stack([(xx * 3 + yy * 2) % 256, (xx + yy * 5) % 256,
                     np.full((21, 17), 77)], axis=2).astype(np.uint8)
    payload = encode_webp(grad)
    assert payload[:4] == b"RIFF" and payload[8:16] == b"WEBPVP8L"
    assert np.array_equal(decode_webp(payload), grad)
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(noise)), noise)
    solid = np.full((1, 1, 3), 9, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(solid)), solid)
    with _pytest.raises(ValueError):
        decode_webp(b"RIFX" + b"\x00" * 20)
    # truncated lossy VP8 chunk: loud ValueError, not garbage pixels
    fake_vp8 = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
                + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4)
    with _pytest.raises(ValueError):
        decode_webp(fake_vp8)


def test_decode_image_webp_dispatch():
    import numpy as np

    from sdk_spark.functions.webp import encode_webp
    from sdk_spark.operators.multimodal import decode_image

    img = np.full((5, 4, 3), 66, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp(img)), img)


# -- round-3: progressive (SOF2) + restart intervals -----------------------------

def test_progressive_roundtrip_matches_baseline():
    """Progressive decode of the same quantized coefficients must be
    BIT-identical to the baseline decode (same DCT/quant; only the entropy
    layering differs)."""
    from sdk_spark.functions.jpeg import encode_jpeg_progressive

    for shape in [(32, 48), (17, 23), (8, 8)]:
        img = _gradient(*shape)
        base = decode_jpeg(encode_jpeg(img, 95))
        prog = decode_jpeg(encode_jpeg_progressive(img, 95))
        assert (prog == base).all(), shape


def test_progressive_grayscale():
    from sdk_spark.functions.jpeg import encode_jpeg_progressive

    g = _gradient(24, 16)[:, :, 0]
    base = decode_jpeg(encode_jpeg(g, 95))
    prog = decode_jpeg(encode_jpeg_progressive(g, 95))
    assert (prog == base).all()


def test_restart_intervals_baseline_and_progressive():
    """RSTn handling: predictor reset + bit realignment must reproduce the
    no-restart decode exactly, for every interval (ADVICE r2: the old
    decoder skipped RSTs inline and silently corrupted pixels)."""
    from sdk_spark.functions.jpeg import encode_jpeg_progressive

    img = _gradient(40, 24)
    base = decode_jpeg(encode_jpeg(img, 95))
    for ri in (1, 2, 3, 7):
        assert (decode_jpeg(encode_jpeg(img, 95, restart_interval=ri))
                == base).all(), f"baseline ri={ri}"
        assert (decode_jpeg(
            encode_jpeg_progressive(img, 95, restart_interval=ri))
            == base).all(), f"progressive ri={ri}"


def test_restart_marker_bytes_present():
    img = _gradient(40, 24)
    payload = encode_jpeg(img, 95, restart_interval=2)
    assert b"\xFF\xDD" in payload                 # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))


def test_arithmetic_coding_still_rejected():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 95))
    i = payload.index(b"\xFF\xC0")
    payload[i + 1] = 0xC9                          # SOF9: arithmetic
    with pytest.raises(ValueError, match="baseline|progressive"):
        decode_jpeg(bytes(payload))


def test_image_job_with_progressive_mix(spark):
    """The fused image job's PSNR invariant holds on a table whose JPEG
    rows are half progressive (some with restart intervals): only the
    planted defects are flagged (VERDICT r2 next-#4 'done' criterion)."""
    from sdk_spark.operators.multimodal import pixel_caption_invariants
    from sdk_spark.sources.images import (canonical_id,
                                          expected_violation_ids,
                                          generate_images)

    n = 300
    df = generate_images(spark, n, partitions=4, jpeg_fraction=0.4,
                         progressive_fraction=0.5)
    viol = pixel_caption_invariants(df).collect()
    got_pixel = {r["image_id"] for r in viol
                 if r["constraint_id"] == "ENGINE_PIXEL_MISMATCH"}
    exp_pixel = {canonical_id(i) for i in expected_violation_ids(n)["pixel"]}
    assert got_pixel == exp_pixel
