"""Trained-IVF (k-means coarse quantizer): recovery, determinism, probe recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sdk_spark.operators.similarity import (
    cosine_topk, ivf_cell_trained, ivf_topk_trained, train_ivf_centroids)

TRUE_CENTERS = np.array([
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
    [-10.0, -10.0, 0.0, 0.0],
])


def planted_df(spark, per_cluster=60, noise=0.5, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for c in TRUE_CENTERS:
        for _ in range(per_cluster):
            v = c + rng.normal(scale=noise, size=4)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def match_centers(trained):
    """Map each true center to its nearest trained centroid distance."""
    return [float(np.sqrt(((trained - t[None, :]) ** 2).sum(1)).min())
            for t in TRUE_CENTERS]


def test_kmeans_recovers_planted_centers(spark):
    df = planted_df(spark)
    C = train_ivf_centroids(df, k=4, iters=10)
    assert C.shape == (4, 4)
    assert max(match_centers(C)) < 1.0, C


def test_kmeans_deterministic(spark):
    df = planted_df(spark)
    C1 = train_ivf_centroids(df, k=4, iters=5)
    C2 = train_ivf_centroids(df.repartition(7), k=4, iters=5)
    # init is xxhash-ordered, not partition-ordered -> identical output
    assert np.allclose(C1, C2)


def test_kmeans_needs_k_vectors(spark):
    df = planted_df(spark, per_cluster=1)  # 4 rows total
    with pytest.raises(ValueError):
        train_ivf_centroids(df, k=16)


def test_ivf_cell_trained_assigns_nearest(spark):
    df = planted_df(spark, per_cluster=30)
    C = train_ivf_centroids(df, k=4, iters=10)
    cells = (df.select("vec_id", "embedding",
                       ivf_cell_trained(F.col("embedding"), C).alias("cell"))
             .collect())
    for r in cells:
        v = np.asarray(r["embedding"])
        want = int(((C - v[None, :]) ** 2).sum(1).argmin())
        assert r["cell"] == want


def test_ivf_topk_trained_recall(spark):
    df = planted_df(spark)
    C = train_ivf_centroids(df, k=4, iters=10)
    q = [9.5, 0.5, 0.0, 0.0]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk_trained(df, q, C, k=10, nprobe=1).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_ivf_topk_trained_nprobe_widens(spark):
    """A query between two clusters needs nprobe=2 to see both."""
    df = planted_df(spark)
    C = train_ivf_centroids(df, k=4, iters=10)
    q = [5.0, 5.0, 0.0, 0.0]
    one = set(r["vec_id"] for r in
              ivf_topk_trained(df, q, C, k=20, nprobe=1).collect())
    two = set(r["vec_id"] for r in
              ivf_topk_trained(df, q, C, k=20, nprobe=2).collect())
    exact = set(r["vec_id"] for r in cosine_topk(df, q, k=20).collect())
    assert len(two & exact) >= len(one & exact)
    assert len(two & exact) / 20 >= 0.8


def test_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over data with only 2 real groups: one centroid may strand;
    # training must not NaN out
    rows = [(i, [0.0, 0.0]) for i in range(20)] + \
           [(100 + i, [50.0, 50.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = train_ivf_centroids(df, k=3, iters=6)
    assert np.isfinite(C).all()


def test_spherical_recall_on_real_embeddings(spark):
    """Spherical training + centroid probe on the 64-dim parquet table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    C = train_ivf_centroids(emb, k=4, iters=5, spherical=True)
    q = [float(x) for x in C[0]]
    exact = set(r["vec_id"] for r in cosine_topk(emb, q, k=10).collect())
    ann = set(r["vec_id"] for r in
              ivf_topk_trained(emb, q, C, k=10, nprobe=2,
                               spherical=True).collect())
    assert len(exact & ann) / 10 >= 0.8


def test_spherical_centroids_unit_norm(spark):
    df = planted_df(spark)
    C = train_ivf_centroids(df, k=4, iters=5, spherical=True)
    assert np.allclose(np.sqrt((C ** 2).sum(axis=1)), 1.0)


def test_trained_probe_on_untrained_index_is_a_clear_error(spark, tmp_path):
    """Probing a quadrant-partitioned index (written without centroids=)
    with the trained probe must raise the explanatory ValueError, not a
    raw PATH_NOT_FOUND AnalysisException for the absent sidecar
    (r4 review finding)."""
    import pytest
    from sdk_spark.operators.similarity import (
        ivf_topk_trained_indexed, write_ann_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx")
    write_ann_index(emb, path, dim=64)          # untrained: no sidecar
    with pytest.raises(ValueError, match="sidecar"):
        ivf_topk_trained_indexed(spark, path, [1.0] + [0.0] * 63, k=5)


def test_append_ann_index_trained(spark, tmp_path):
    """Incremental index maintenance (VERDICT r4 #6): append a second
    batch against the EXISTING centroid sidecar; the pruned probe sees
    old + new rows, cells agree with the build kernel, the prune pin is
    unchanged, and the skew audit reflects the new totals."""
    import re

    from sdk_spark.operators.similarity import (
        ann_index_cell_stats, append_ann_index, ivf_topk_trained,
        ivf_topk_trained_indexed, write_ann_index)

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    first, second = df.where("vec_id < 200"), df.where("vec_id >= 200")
    C = train_ivf_centroids(first, k=4, iters=3, spherical=True)
    path = str(tmp_path / "ann_app")
    write_ann_index(first, path, n_planes=6, dim=8, centroids=C,
                    spherical=True)
    append_ann_index(second, path)

    assert spark.read.parquet(path).count() == 400
    stats = {r["ivf_cell"]: r["n"] for r in
             ann_index_cell_stats(spark, path).collect()}
    assert sum(stats.values()) == 400 and all(c >= 0 for c in stats)

    q = [1.0, -1.0] + [0.0] * 6
    # nprobe = all cells → the indexed probe must equal the unindexed
    # trained probe over the FULL (old + new) data with the same centroids
    got = [r["vec_id"] for r in
           ivf_topk_trained_indexed(spark, path, q, k=10, nprobe=4).collect()]
    want = [r["vec_id"] for r in
            ivf_topk_trained(df, q, C, k=10, nprobe=4,
                             spherical=True).collect()]
    assert got == want
    assert any(v >= 200 for v in got), "appended rows never probeable"
    # partition-prune pin unchanged after the append
    narrow = ivf_topk_trained_indexed(spark, path, q, k=5, nprobe=2)
    text = narrow._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*ivf_cell.*\]", text), text


def test_append_ann_index_quadrant(spark, tmp_path):
    """Quadrant (untrained) indexes append too: the deterministic
    sign-bucket and the recorded LSH params are rebuilt from the meta
    sidecar, and the indexed probe equals the unindexed one on old+new."""
    from sdk_spark.operators.similarity import (
        append_ann_index, ivf_topk, ivf_topk_indexed, write_ann_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first, second = emb.where("vec_id % 2 = 0"), emb.where("vec_id % 2 = 1")
    path = str(tmp_path / "ann_quad")
    write_ann_index(first, path, dim=64)
    append_ann_index(second, path)
    q = [1.0] + [0.0] * 63
    got = [r["vec_id"] for r in
           ivf_topk_indexed(spark, path, q, k=8).collect()]
    want = [r["vec_id"] for r in ivf_topk(emb, q, k=8).collect()]
    assert got == want


def test_append_pre_meta_index_is_clear_error(spark, tmp_path):
    """An index written before meta support (meta file removed) refuses
    the append with a pointer, instead of guessing quantizer params."""
    import os

    from sdk_spark.operators.similarity import (
        append_ann_index, write_ann_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ann_old")
    write_ann_index(emb, path, dim=64)
    os.remove(os.path.join(path, "_sdk_ann_meta.json"))
    with pytest.raises(ValueError, match="appendable"):
        append_ann_index(emb, path)
