"""Round-5 review-sweep pins: NaN/null-element embedding hygiene.

Spark orders NaN ABOVE every real double and evaluates ``NaN >= t`` as
true (NaN-as-largest semantics), so before these fixes one corrupt
embedding won every top-k probe, manufactured near-dup pairs, polluted
the real cell-0 partition of ANN indexes, and poisoned k-means training.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, extra=()):
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    rows += list(extra)
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


NAN_ROW = (900, [float("nan")] + [0.0] * 7)
NULL_ELEM_ROW = (901, [None] + [0.0] * 7)
SHORT_ROW = (902, [1.0, 2.0])
NULL_ROW = (903, None)
POISON = (NAN_ROW, NULL_ELEM_ROW, SHORT_ROW, NULL_ROW)


def test_cosine_topk_nan_embedding_ranks_last(spark):
    from sdk_spark.operators.similarity import cosine_topk

    df = _emb(spark, POISON)
    q = [1.0, -0.5] + [0.0] * 6
    got = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    assert not set(got) & {900, 901, 902, 903}, got
    clean = [r["vec_id"] for r in cosine_topk(_emb(spark), q, k=10).collect()]
    assert got == clean


def test_cosine_near_dups_nan_makes_no_pairs(spark):
    from sdk_spark.operators.similarity import cosine_near_duplicates

    # two identical NaN-bearing vectors share every LSH bucket; their
    # pairwise score is NaN and must NOT pass the >= threshold gate
    bad = [(910, [float("nan")] * 8), (911, [float("nan")] * 8)]
    df = _emb(spark, bad)
    pairs = cosine_near_duplicates(df, threshold=0.95, dim=8).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert not ids & {910, 911}, pairs


def test_ivf_bucket_sentinel_for_malformed_vectors(spark):
    from sdk_spark.operators.similarity import ivf_bucket

    df = _emb(spark, POISON)
    cells = {r["vec_id"]: r["cell"] for r in
             df.select("vec_id",
                       ivf_bucket(F.col("embedding"), 4).alias("cell"))
             .collect()}
    for vid in (900, 901, 902, 903):
        assert cells[vid] == -1, (vid, cells[vid])
    assert all(0 <= c < 16 for vid, c in cells.items() if vid < 100)


def test_assign_cells_arrow_nan_sentinel(spark):
    from sdk_spark.operators.similarity import assign_cells_arrow

    C = np.eye(4, 8)
    df = _emb(spark, POISON)
    cells = {r["vec_id"]: r["ivf_cell"] for r in
             assign_cells_arrow(df, C, "embedding").collect()}
    for vid in (900, 901, 902, 903):
        assert cells[vid] == -1, (vid, cells[vid])
    assert all(0 <= c < 4 for vid, c in cells.items() if vid < 100)


def test_train_ivf_ignores_poison_rows(spark):
    from sdk_spark.operators.similarity import train_ivf_centroids

    clean = _emb(spark)
    dirty = _emb(spark, POISON)
    Cc = train_ivf_centroids(clean, k=3, iters=4)
    Cd = train_ivf_centroids(dirty, k=3, iters=4)
    assert np.isfinite(Cd).all()
    assert np.allclose(Cc, Cd), "poison rows changed the trained centroids"
