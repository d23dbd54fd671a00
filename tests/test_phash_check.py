"""Stored-phash vs decoded-pixels consistency check + compute_phash."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdk_spark import errors as E
from sdk_spark.operators.multimodal import compute_phash, pixel_caption_invariants
from sdk_spark.plans.image_job import validate_images
from sdk_spark.sources.images import average_hash, generate_images


def _mutate_phash(df, every: int):
    """Flip 16 hash bits on a deterministic subset (row hash % every == 0)."""
    victim = F.xxhash64("image_id") % every == 0
    return df.withColumn(
        "phash",
        F.when(victim, F.col("phash").bitwiseXOR(F.lit(0x1111111111111111)))
        .otherwise(F.col("phash"))), victim


def test_clean_table_has_no_phash_violations(spark):
    df = generate_images(spark, 160, partitions=4, plant=False,
                         jpeg_fraction=0.3, webp_fraction=0.2,
                         lossy_webp_fraction=0.5)
    inv = pixel_caption_invariants(df, check_phash=True)
    bad = inv.where(F.col("constraint_id") == E.ENGINE_PHASH_MISMATCH)
    assert bad.count() == 0


def test_planted_phash_mismatch_surfaces(spark):
    df = generate_images(spark, 160, partitions=4, plant=False)
    mutated, victim = _mutate_phash(df, every=5)
    expected = sorted(r["image_id"]
                      for r in df.where(victim).select("image_id").collect())
    assert expected, "fixture must plant at least one victim"
    inv = pixel_caption_invariants(mutated, check_phash=True)
    got = sorted(r["image_id"] for r in inv.where(
        F.col("constraint_id") == E.ENGINE_PHASH_MISMATCH).collect())
    assert got == expected


def test_image_job_check_phash_only(spark):
    """check_phash without check_pixels reports ONLY phash rows."""
    df = generate_images(spark, 120, partitions=4, plant=False)
    mutated, victim = _mutate_phash(df, every=6)
    res = validate_images(mutated, check_phash=True)
    codes = {r["constraint_id"]
             for r in res.violations.select("constraint_id").distinct().collect()}
    assert codes == {E.ENGINE_PHASH_MISMATCH}
    n_victims = df.where(victim).count()
    assert res.violations.count() == n_victims
    res.unpersist()


def test_image_job_fused_pixels_and_phash(spark):
    """Planted generator defects AND phash mutations surface together."""
    df = generate_images(spark, 200, partitions=4)
    mutated, _ = _mutate_phash(df, every=7)
    res = validate_images(mutated, check_pixels=True, check_phash=True)
    codes = {r["constraint_id"]
             for r in res.violations.select("constraint_id").distinct().collect()}
    assert E.ENGINE_PHASH_MISMATCH in codes
    assert E.ENGINE_PIXEL_MISMATCH in codes       # planted noise rows
    assert E.ENGINE_CAPTION_MISMATCH in codes     # planted caption rows
    res.unpersist()


def test_compute_phash_matches_stored(spark):
    """compute_phash over lossless rows reproduces the stored column."""
    df = generate_images(spark, 100, partitions=4, plant=False)  # all png
    joined = (compute_phash(df)
              .join(df.select("image_id", "phash"), "image_id"))
    assert joined.where(~F.col("decode_ok")).count() == 0
    assert joined.where(F.col("phash_computed") != F.col("phash")).count() == 0


def test_compute_phash_bad_payload(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"not-an-image")), ("b", None)],
        "image_id string, bytes binary")
    rows = {r["image_id"]: (r["phash_computed"], r["decode_ok"])
            for r in compute_phash(df).collect()}
    assert rows == {"a": (None, False), "b": (None, False)}


def test_average_hash_channel_shapes():
    import numpy as np
    rgb = np.random.RandomState(7).randint(0, 256, (32, 40, 3)).astype(np.uint8)
    rgba = np.dstack([rgb, np.full((32, 40), 128, np.uint8)])
    assert average_hash(rgb) == average_hash(rgba)
    gray = rgb[..., :3].mean(axis=2)
    assert average_hash(gray) == average_hash(np.dstack([gray] * 3))


def test_phash_check_survives_null_in_batch(spark):
    """A NULL phash in the batch must not degrade other rows' hashes to
    float64 (full-range int64 loses low bits -> false positives)."""
    df = generate_images(spark, 40, partitions=1, plant=False)
    # full-range hash values: replant phash with huge magnitudes, one NULL
    df2 = df.withColumn(
        "phash",
        F.when(F.xxhash64("image_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("phash")))
    inv = pixel_caption_invariants(df2, check_phash=True)
    # NULL rows are skipped; all non-null stored hashes are genuinely
    # consistent, so NO violations may appear (float64 coercion would
    # corrupt ~2^63-magnitude hashes by up to 2^11)
    bad = inv.where(F.col("constraint_id") == E.ENGINE_PHASH_MISMATCH)
    assert bad.count() == 0


def test_phash_only_mode_reports_decode_failures(spark):
    """check_phash without check_pixels must still flag undecodable rows."""
    df = generate_images(spark, 30, partitions=1, plant=False)
    broken = df.withColumn(
        "bytes",
        F.when(F.xxhash64("image_id") % 10 == 0,
               F.lit(bytearray(b"not-an-image"))).otherwise(F.col("bytes")))
    res = validate_images(broken, check_phash=True)
    codes = {r["constraint_id"]: r["violations"]
             for r in res.violations.groupBy("constraint_id").count()
             .withColumnRenamed("count", "violations").collect()}
    res.unpersist()
    assert E.ENGINE_PIXEL_MISMATCH in codes        # decode-failed rows
