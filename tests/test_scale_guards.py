"""Scale guards: gated broadcasts and capped LSH buckets on skewed data.

FIXTURES.md skew stressor: 30% of rows share one hot key / one mega-bucket.
At 100 TB an unguarded broadcast of a billions-row duplicate set OOMs the
driver, and an uncapped LSH bucket self-join goes quadratic in one task;
these tests prove the guards bound both while keeping results identical on
the non-skewed remainder.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """600 docs; 200 share ONE boilerplate text (mega-bucket), the rest are
    unique paragraphs with two planted near-dup pairs."""
    boiler = ("this website uses cookies to improve your experience "
              "accept all cookies to continue reading the article")
    rows = [(i, boiler) for i in range(200)]
    for i in range(200, 600):
        rows.append((i, f"unique paragraph number {i} about topic {i * 7 % 13} "
                        f"with some distinct content tail {i * i}"))
    # planted near-dups: 9000/9001 mutate doc 300's text slightly
    base = rows[300][1]
    rows.append((9000, base.replace("distinct", "separate")))
    rows.append((9001, base + " extra"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_pairs(spark, skewed_docs):
    from sdk_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_oversized_buckets,
    )

    capped = minhash_lsh_candidates(skewed_docs, max_bucket_size=50)
    pairs = capped.collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 200-member mega-bucket (199*200/2 = 19900 pairs/band) is excluded
    assert not any(a < 200 and b < 200 for a, b in found)
    # planted near-dups in small buckets survive the cap
    assert (300, 9000) in found and (300, 9001) in found
    # audit trail reports the dropped bucket with its true size
    report = minhash_oversized_buckets(skewed_docs, max_bucket_size=50).collect()
    assert any(r["members"] == 200 for r in report)  # the boilerplate bucket


def test_minhash_uncapped_still_works(spark, skewed_docs):
    from sdk_spark.operators.dedup import minhash_lsh_candidates

    uncapped = minhash_lsh_candidates(skewed_docs, max_bucket_size=None)
    n = uncapped.where((F.col("id_a") < 200) & (F.col("id_b") < 200)).count()
    assert n == 199 * 200 // 2  # the quadratic blowup the cap prevents


def test_simhash_bucket_cap(spark, skewed_docs):
    from sdk_spark.operators.dedup import (
        simhash_candidates,
        simhash_oversized_buckets,
    )

    capped = simhash_candidates(skewed_docs, max_bucket_size=50)
    found = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a < 200 and b < 200 for a, b in found)
    report = simhash_oversized_buckets(skewed_docs, max_bucket_size=50).collect()
    assert any(r["members"] == 200 for r in report)  # the boilerplate bucket


def test_gated_broadcast_falls_back_and_matches(spark, skewed_docs):
    from sdk_spark.operators.table_checks import unique_violations

    df = skewed_docs.withColumn("k", F.when(F.col("doc_id") < 200, F.lit(0))
                                      .otherwise(F.col("doc_id")))
    # threshold 0 → probe always exceeds → shuffle-join fallback
    shuffled = unique_violations(df, ["k"], broadcast_threshold=0,
                                 strategy="probe")
    # generous threshold → probe passes → broadcast path
    bcast = unique_violations(df, ["k"], broadcast_threshold=10_000,
                              strategy="probe")
    # probe-free: AQE decides from the dup agg's runtime shuffle size
    aqe = unique_violations(df, ["k"], strategy="aqe")
    rows_s = sorted((r["k"], r["multiplicity"]) for r in shuffled.collect())
    rows_b = sorted((r["k"], r["multiplicity"]) for r in bcast.collect())
    rows_a = sorted((r["k"], r["multiplicity"]) for r in aqe.collect())
    assert rows_s == rows_b == rows_a
    assert rows_s and all(k == 0 and m == 200 for k, m in rows_s)
    # the physical plans actually diverge: broadcast hint present only once
    assert "Broadcast" in bcast._jdf.queryExecution().executedPlan().toString()


def test_exact_duplicates_gated(spark, skewed_docs):
    from sdk_spark.operators.dedup import exact_duplicates

    for thr in (0, 10_000):
        groups = exact_duplicates(skewed_docs, broadcast_threshold=thr).collect()
        assert len(groups) == 1 and groups[0]["n"] == 200


def test_cosine_bucket_cap(spark):
    import numpy as np

    from sdk_spark.operators.similarity import (
        cosine_near_duplicates,
        oversized_cosine_buckets,
    )

    rng = np.random.RandomState(3)
    hot = rng.normal(size=8)
    rows = [(i, [float(x) for x in hot + rng.normal(scale=1e-4, size=8)])
            for i in range(100)]
    rows += [(100 + i, [float(x) for x in rng.normal(size=8)])
             for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = cosine_near_duplicates(df, threshold=0.99, n_planes=8, dim=8,
                                    max_bucket_size=20)
    found = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a < 100 and b < 100 for a, b in found)
    report = oversized_cosine_buckets(df, n_planes=8, dim=8,
                                      max_bucket_size=20).collect()
    assert report and max(r["members"] for r in report) >= 100
