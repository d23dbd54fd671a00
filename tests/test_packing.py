"""Sequence packing + deterministic hash splits vs pure-Python references."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdk_spark.operators.packing import (
    hash_split, pack_sequences, pack_stats, split_bucket, _KNUTH, _KEY_MOD)


def reference_next_fit(docs, max_tokens):
    """(id -> (bin, fill, oversize)) for the sequential next-fit walk."""
    out = {}
    bin_no, fill = 0, 0
    for _id, tok in sorted(docs):
        if tok > max_tokens:
            bin_no += 1
            out[_id] = (bin_no, tok, True)
            bin_no += 1
            fill = 0
            continue
        if fill + tok > max_tokens:
            bin_no += 1
            fill = 0
        fill += tok
        out[_id] = (bin_no, fill, False)
    return out


def test_pack_matches_reference_single_partition(spark):
    docs = [(i, 100 + (i * 37) % 900) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    got = {r["id"]: (r["bin_id"], r["bin_fill"], r["oversize"])
           for r in pack_sequences(df, max_tokens=2048,
                                   num_partitions=1).collect()}
    assert got == reference_next_fit(docs, 2048)


def test_pack_oversize_gets_own_bin(spark):
    docs = [(1, 100), (2, 5000), (3, 100)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    rows = {r["id"]: r for r in
            pack_sequences(df, max_tokens=2048, num_partitions=1).collect()}
    assert rows[2]["oversize"] and rows[2]["bin_fill"] == 5000
    assert rows[1]["bin_id"] != rows[2]["bin_id"] != rows[3]["bin_id"]
    assert got_invariants(rows.values(), 2048)


def got_invariants(rows, max_tokens):
    from collections import defaultdict
    per_bin = defaultdict(int)
    for r in rows:
        per_bin[r["bin_id"]] += r["tok"]
        if not r["oversize"]:
            assert r["bin_fill"] <= max_tokens
    for b, tot in per_bin.items():
        oversized = any(r["oversize"] for r in rows if r["bin_id"] == b)
        assert oversized or tot <= max_tokens
    return True


def test_pack_parallel_invariants(spark):
    """Multi-partition packing: bins never overflow, every doc assigned
    exactly once, bin ids unique across partitions."""
    docs = [(i, 1 + (i * 131) % 3000) for i in range(2000)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    packed = pack_sequences(df, max_tokens=2048, num_partitions=8).collect()
    assert len(packed) == 2000
    assert len({r["id"] for r in packed}) == 2000
    assert got_invariants(packed, 2048)


def test_pack_stats_utilization(spark):
    docs = [(i, 1024) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    packed = pack_sequences(df, max_tokens=2048, num_partitions=1)
    stats = pack_stats(packed, 2048).collect()
    assert all(r["n_docs"] == 2 and r["utilization"] == 1.0 for r in stats)
    assert len(stats) == 5


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=0)


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(20000)], "doc_id long")
    w = {"train": 80, "valid": 10, "test": 10}
    counts = {r["split"]: r["count"] for r in
              hash_split(df, "doc_id", w).groupBy("split").count().collect()}
    assert set(counts) == set(w)
    for name, pct in w.items():
        assert abs(counts[name] / 20000 - pct / 100) < 0.02, counts
    # repartitioning must not move any row between splits
    a = {(r["doc_id"], r["split"]) for r in
         hash_split(df, "doc_id", w).collect()}
    b = {(r["doc_id"], r["split"]) for r in
         hash_split(df.repartition(13), "doc_id", w).collect()}
    assert a == b


def test_hash_split_weights_must_sum(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 90, "valid": 5})


def reference_bucket(key: int) -> int:
    """Pure-Python twin of split_bucket (== its documented SQL form)."""
    return ((((key % _KEY_MOD) * _KNUTH) % (1 << 32)) * 100) >> 32


def test_split_bucket_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {r["doc_id"]: r["b"] for r in
           df.select("doc_id", split_bucket(F.col("doc_id")).alias("b")).collect()}
    for i in range(500):
        assert got[i] == reference_bucket(i)


@pytest.mark.parametrize("stride", [10, 100, 1000])
def test_split_bucket_mixes_strided_keys(spark, stride):
    """Ids that are multiples of 10/100 (scaled / snowflake-style ids)
    must still spread across ~all buckets — the naive (r*K) % 100 form
    collapsed stride-10 keys into 10 buckets and emptied split bands."""
    df = spark.createDataFrame([(i * stride,) for i in range(2000)],
                               "doc_id long")
    buckets = {r["b"] for r in
               df.select(split_bucket(F.col("doc_id")).alias("b"))
                 .distinct().collect()}
    assert len(buckets) >= 95, f"stride {stride} hit only {len(buckets)}"
    # and every band of a standard 80/10/10 split is populated
    counts = {r["split"]: r["count"] for r in
              hash_split(df, "doc_id", {"train": 80, "valid": 10,
                                        "test": 10})
              .groupBy("split").count().collect()}
    assert set(counts) == {"train", "valid", "test"}, counts


def test_pack_rows_matches_pack_sequences_without_splits(spark):
    """The fused full-row form assigns the identical (bin_id, bin_fill,
    oversize) as the slim+join form on the same partitioning."""
    from sdk_spark.operators.packing import pack_rows

    docs = [(i, f"doc {i}", (i * 37) % 90 + 1) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string, n_tokens long")
    slim = {r["id"]: (r["bin_id"], r["bin_fill"], r["oversize"])
            for r in pack_sequences(df, max_tokens=128,
                                    num_partitions=4).collect()}
    full = pack_rows(df, max_tokens=128, num_partitions=4)
    assert {r["doc_id"]: (r["bin_id"], r["bin_fill"], r["oversize"])
            for r in full.collect()} == slim
    # full rows ride through: every input column is still there
    assert set(full.columns) == {"doc_id", "text", "n_tokens",
                                 "bin_id", "bin_fill", "oversize"}


def test_pack_rows_split_boundary_resets_bins(spark):
    """With split_col, a bin never mixes splits, budgets hold, and the
    assignment is deterministic under input repartitioning."""
    from collections import defaultdict

    from sdk_spark.operators.packing import pack_rows

    docs = [(i, "train" if i % 5 else "valid", (i * 53) % 100 + 1)
            for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, split string, n_tokens long")
    out = pack_rows(df, max_tokens=128, num_partitions=4,
                    split_col="split").collect()
    by_bin_splits, by_bin_fill = defaultdict(set), defaultdict(int)
    for r in out:
        by_bin_splits[r["bin_id"]].add(r["split"])
        by_bin_fill[r["bin_id"]] += r["n_tokens"]
    assert all(len(s) == 1 for s in by_bin_splits.values())
    assert all(tot <= 128 for tot in by_bin_fill.values())
    again = pack_rows(df.repartition(7), max_tokens=128, num_partitions=4,
                      split_col="split").collect()
    assert {r["doc_id"]: r["bin_id"] for r in again} \
        == {r["doc_id"]: r["bin_id"] for r in out}


def test_pack_rows_rejects_colliding_columns(spark):
    from sdk_spark.operators.packing import pack_rows

    df = spark.createDataFrame([(1, 5, 9)],
                               "doc_id long, n_tokens long, bin_id long")
    with pytest.raises(ValueError, match="bin_id"):
        pack_rows(df)
