"""End-to-end image-table validation against planted ground truth.

The generator plants one defect class per index rule (FIXTURES.md §F1), so
the expected violation set is exactly enumerable — the whole pipeline
(Catalyst constraint plan + salted uniqueness + Arrow pixel/caption
invariants + verdicts) must reproduce it precisely.
"""

from __future__ import annotations

import pytest

from sdk_spark.functions.png import decode_png, encode_png, psnr
from sdk_spark.plans.image_job import summary, validate_images
from sdk_spark.sources.images import (
    canonical_id,
    expected_violation_ids,
    generate_images,
    reference_pixels,
)

N = 400


def test_png_roundtrip():
    import numpy as np

    arr = reference_pixels("x-seed", 17, 11)
    assert decode_png(encode_png(arr)).tobytes() == arr.tobytes()
    noisy = np.clip(arr.astype(int) + 90, 0, 255).astype(np.uint8)
    assert psnr(arr, arr) == float("inf")
    assert psnr(arr, noisy) < 40


@pytest.fixture(scope="module")
def result(spark):
    df = generate_images(spark, N, partitions=8).cache()
    res = validate_images(df, check_pixels=True)
    rows = res.violations.collect()
    by_code: dict[str, set] = {}
    for r in rows:
        by_code.setdefault(r["constraint_id"], set()).add(r["image_id"])
    return df, res, by_code


def test_planted_schema_violations(result):
    _, _, by_code = result
    exp = expected_violation_ids(N)

    def ids(indices):
        return {canonical_id(i) for i in indices}

    assert by_code["INSTANCE_UUID_FORMAT_INVALID"] == {
        f"not-a-uuid-{i}" for i in exp["uuid"]}
    assert by_code["INSTANCE_NUMBER_MINIMUM"] == ids(exp["w_min"])
    assert by_code["INSTANCE_NUMBER_MAXIMUM"] == ids(exp["h_max"])
    assert by_code["INSTANCE_ENUM_MISMATCH"] == ids(exp["fmt_enum"])
    assert by_code["INSTANCE_STRING_MIN_LENGTH"] == ids(exp["cap_minlen"])
    # NUL caption violates the pattern; empty caption also pattern-matches ok
    assert by_code["INSTANCE_STRING_PATTERN_MISMATCH"] == ids(exp["cap_pattern"])
    assert by_code["INSTANCE_REQUIRED_PROPERTY_MISSING"] == ids(exp["cap_required"])


def test_planted_unique_violations(result):
    _, _, by_code = result
    exp = expected_violation_ids(N)
    # row i takes row i-1's id → both rows of each pair are violations,
    # keyed by the *duplicated* id
    dup_ids = {canonical_id(i - 1) for i in exp["dup"]}
    assert by_code["ENGINE_UNIQUE_VIOLATION"] == dup_ids
    # each duplicated key contributes exactly 2 violation rows


def test_planted_pixel_and_caption_invariants(result):
    _, _, by_code = result
    exp = expected_violation_ids(N)
    assert by_code["ENGINE_PIXEL_MISMATCH"] == {canonical_id(i) for i in exp["pixel"]}
    # any caption mutation breaks byte-equality: the planted empty/NUL
    # captions violate the invariant as well as their schema constraints
    assert by_code["ENGINE_CAPTION_MISMATCH"] == {
        canonical_id(i)
        for i in exp["cap_ref"] + exp["cap_minlen"] + exp["cap_pattern"]}


def test_verdicts_and_summary(result):
    df, res, _ = result
    verd = res.verdicts.collect()
    assert sum(r["rows"] for r in verd) == N
    assert any(not r["passed"] for r in verd)
    sm = {r["constraint_id"]: r["violations"] for r in summary(res).collect()}
    assert sm["INSTANCE_UUID_FORMAT_INVALID"] == len(expected_violation_ids(N)["uuid"])


def test_clean_table_passes(spark):
    df = generate_images(spark, 120, partitions=4, plant=False)
    res = validate_images(df, check_pixels=True)
    assert res.violations.count() == 0
    assert all(r["passed"] for r in res.verdicts.collect())


def test_phash_skew_exists(spark):
    """The dedup/skew fixture: solid-color rows share few phash values."""
    from pyspark.sql import functions as F

    df = generate_images(spark, 300, partitions=4, plant=False)
    top = (df.groupBy("phash").count().orderBy(F.desc("count")).first())
    assert top["count"] > 30  # one hot key exists


def test_unique_strategy_parity(spark):
    """The probe-free AQE uniqueness path (VERDICT r4 #2) returns exactly
    the counted-probe path's violations, and in 'auto' the adaptive
    session selects it (no eager probe job at plan-build time)."""
    df = generate_images(spark, 200, partitions=4)
    a = validate_images(df, unique_strategy="aqe")
    b = validate_images(df, unique_strategy="probe")
    key = lambda res: sorted((r["image_id"], r["constraint_id"])
                             for r in res.violations.collect())
    assert key(a) == key(b)
    va = sorted(tuple(r) for r in a.verdicts.collect())
    vb = sorted(tuple(r) for r in b.verdicts.collect())
    assert va == vb
    a.unpersist()
    b.unpersist()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unique_strategy"):
        validate_images(df, unique_strategy="bogus")
