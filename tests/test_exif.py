"""EXIF: TIFF-IFD parsing, orientation transforms, consistency operator.

Orientation ground truth is the TIFF 6.0 / EXIF 2.32 definition: the
value says where the row-0/column-0 of the STORED pixels sits on the
DISPLAYED image.  The 8-case table below is hand-derived from that
definition (a 2x3 asymmetric probe array), so apply_orientation is pinned
against the spec, not against itself.
"""
from __future__ import annotations

import numpy as np
import pytest

from sdk_spark.functions.exif import (apply_orientation, build_exif_tiff,
                                      extract_exif, inject_jpeg_exif,
                                      inject_webp_exif, parse_tiff_exif)

# stored probe: rows 0..1, cols 0..2, single channel values 0..5
STORED = np.arange(6, dtype=np.uint8).reshape(2, 3)

# displayed results for orientations 1..8 (hand-derived)
EXPECT = {
    1: STORED,
    2: STORED[:, ::-1],                     # mirrored horizontally
    3: STORED[::-1, ::-1],                  # rotated 180
    4: STORED[::-1, :],                     # mirrored vertically
    5: STORED.T,                            # transpose
    6: STORED.T[:, ::-1],                   # rotate 90 CW
    7: STORED.T[::-1, ::-1],                # transverse
    8: STORED.T[::-1, :],                   # rotate 90 CCW
}


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_apply_orientation_table(o):
    assert np.array_equal(apply_orientation(STORED, o), EXPECT[o])


def test_apply_orientation_bad_value():
    with pytest.raises(ValueError):
        apply_orientation(STORED, 9)


@pytest.mark.parametrize("bo", ["little", "big"])
def test_tiff_block_round_trip(bo):
    blk = build_exif_tiff(orientation=6, exif_w=4032, exif_h=3024,
                          byte_order=bo)
    meta = parse_tiff_exif(blk)
    assert meta == {"orientation": 6, "exif_w": 4032, "exif_h": 3024}


def test_tiff_orientation_only():
    meta = parse_tiff_exif(build_exif_tiff(orientation=3))
    assert meta["orientation"] == 3
    assert meta["exif_w"] is None and meta["exif_h"] is None


def test_corrupt_tiff_raises():
    with pytest.raises(ValueError):
        parse_tiff_exif(b"XX\x00\x2a\x00\x00\x00\x08")
    with pytest.raises(ValueError):
        parse_tiff_exif(b"II\x2b\x00\x08\x00\x00\x00")   # magic != 42
    with pytest.raises(ValueError):
        parse_tiff_exif(build_exif_tiff(orientation=6)[:10])


def _jpeg_fixture(w=24, h=16):
    from sdk_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(11)
    return encode_jpeg(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


def test_jpeg_app1_injection_and_extraction():
    jpeg = _jpeg_fixture()
    assert extract_exif(jpeg) is None               # clean fixture: no EXIF
    tagged = inject_jpeg_exif(jpeg, build_exif_tiff(6, 16, 24))
    meta = extract_exif(tagged)
    assert meta == {"orientation": 6, "exif_w": 16, "exif_h": 24}
    # the image itself still decodes identically
    from sdk_spark.functions.jpeg import decode_jpeg

    assert np.array_equal(decode_jpeg(tagged), decode_jpeg(jpeg))


def test_webp_exif_chunk():
    from sdk_spark.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (10, 14, 3)).astype(np.uint8)
    webp = encode_webp(img)
    assert extract_exif(webp) is None
    tagged = inject_webp_exif(webp, build_exif_tiff(8))
    assert extract_exif(tagged)["orientation"] == 8
    assert np.array_equal(decode_webp(tagged), img)


def test_decode_image_auto_orient():
    from sdk_spark.functions.jpeg import decode_jpeg
    from sdk_spark.operators.multimodal import decode_image

    jpeg = _jpeg_fixture(w=24, h=16)
    tagged = inject_jpeg_exif(jpeg, build_exif_tiff(6))
    plain = decode_jpeg(jpeg)
    # stored 16x24 -> displayed 24x16 after the 90 CW rotation
    oriented = decode_image(tagged, auto_orient=True)
    assert oriented.shape[:2] == (24, 16)
    assert np.array_equal(oriented, np.swapaxes(plain, 0, 1)[:, ::-1])
    assert decode_image(tagged).shape[:2] == (16, 24)   # default: as stored


def test_exif_consistency_operator(spark):
    from sdk_spark.operators.multimodal import exif_consistency_violations

    jpeg = _jpeg_fixture()
    rows = [
        # portrait shot: orientation 6, EXIF dims in storage order,
        # declared (w, h) in display order — consistent, no violation
        ("ok-portrait", bytearray(inject_jpeg_exif(
            jpeg, build_exif_tiff(6, exif_w=4032, exif_h=3024))), 3024, 4032),
        # EXIF says 100x50, metadata says 200x50 — violation
        ("bad-dims", bytearray(inject_jpeg_exif(
            jpeg, build_exif_tiff(1, exif_w=100, exif_h=50))), 200, 50),
        # no EXIF at all — not a violation
        ("no-exif", bytearray(jpeg), 24, 16),
        # EXIF orientation only (no dims) — nothing to compare
        ("orient-only", bytearray(inject_jpeg_exif(
            jpeg, build_exif_tiff(3))), 24, 16),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int")
    got = exif_consistency_violations(df).collect()
    assert [r["image_id"] for r in got] == ["bad-dims"]
    assert got[0]["constraint_id"] == "ENGINE_EXIF_DIMS_MISMATCH"
    assert got[0]["value"] == "100x50"


def test_validate_images_check_exif(spark):
    from sdk_spark.plans.image_job import validate_images

    jpeg = _jpeg_fixture()
    rows = [
        ("11111111-1111-4111-8111-111111111111",
         bytearray(inject_jpeg_exif(jpeg, build_exif_tiff(1, 24, 16))),
         24, 16, "jpeg", "a caption", 1),
        ("22222222-2222-4222-8222-222222222222",
         bytearray(inject_jpeg_exif(jpeg, build_exif_tiff(1, 999, 16))),
         24, 16, "jpeg", "a caption", 2),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    res = validate_images(df, check_exif=True)
    exif_viol = [r for r in res.violations.collect()
                 if r["constraint_id"] == "ENGINE_EXIF_DIMS_MISMATCH"]
    assert len(exif_viol) == 1
    assert exif_viol[0]["image_id"].startswith("22222222")
    res.unpersist()
