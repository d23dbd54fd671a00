"""Connected-components dedup clustering vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sdk_spark.operators.cluster import (
    connected_components, dup_clusters, resolve_duplicates)


def union_find_labels(edges):
    """Oracle: min-id component labels via classic union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def run_cc(spark, edges, **kw):
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


@pytest.mark.parametrize("edges", [
    [(1, 2)],
    [(1, 2), (2, 3), (3, 4)],                      # chain
    [(1, 2), (3, 4), (5, 6)],                      # three pairs
    [(2, 1), (1, 2), (2, 3)],                      # dup + reversed edges
    [(10, 20), (20, 10)],                          # symmetric only
    [(i, i + 1) for i in range(1, 30)],            # long chain (diameter 29)
    [(1, k) for k in range(2, 40)],                # star hub
])
def test_cc_matches_union_find(spark, edges):
    assert run_cc(spark, edges) == union_find_labels(edges)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(10, 60)
        edges = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(n * 2)]
        edges = [(u, v) for u, v in edges if u != v]
        assert run_cc(spark, edges) == union_find_labels(edges)


def test_cc_skewed_hub(spark):
    """One hub connected to 500 nodes — the collect-free path must not
    need a materialized neighborhood array."""
    edges = [(1, k) for k in range(2, 502)] + [(600, 601)]
    labels = run_cc(spark, edges)
    assert set(labels[k] for k in range(1, 502)) == {1}
    assert labels[600] == labels[601] == 600


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    out = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dup_clusters_alias(spark):
    df = spark.createDataFrame([(5, 3), (3, 1)], "id_a long, id_b long")
    out = {r["id"]: r["cluster_id"] for r in dup_clusters(df).collect()}
    assert out == {1: 1, 3: 1, 5: 1}


def test_resolve_duplicates_keeps_cluster_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(1, 9)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = sorted(r["doc_id"]
                  for r in resolve_duplicates(docs, pairs).collect())
    # clusters {1,2,3} -> keep 1, {5,6} -> keep 5; 4,7,8 untouched
    assert kept == [1, 4, 5, 7, 8]


def test_cc_no_convergence_raise(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=0)


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_uses_reliable_checkpoint_when_dir_configured(spark, tmp_path):
    """With sc.setCheckpointDir set (the production configuration), the
    fixpoint rounds use RELIABLE checkpoint() — files appear under the
    checkpoint dir, so a lost executor cannot kill the iteration — and
    the labeling is unchanged."""
    import os
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 1)],
            "id_a long, id_b long")
        got = {(r["id"], r["cluster_id"])
               for r in connected_components(pairs).collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (7, 1), (8, 1), (9, 1),
                       (4, 4), (5, 4)}
        found = [f for _, _, files in os.walk(ckdir) for f in files]
        assert found, "no reliable checkpoint files written"
    finally:
        # pyspark has no unset API; clear the scala Option directly so
        # other tests sharing the session fall back to localCheckpoint
        scala_none = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)
    assert sc.getCheckpointDir() is None
