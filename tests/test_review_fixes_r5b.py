"""Round-5 second review-sweep pins: fail-closed guards on the similarity
index lifecycle and the chunked-sessionize configuration space.

Each test reproduces a silent-corruption path the sweep found: degenerate
k-means init after the modal-length filter, wrong-dimensionality index
appends bucketing rows invisibly, the ``ivf_cell = -1`` sentinel shifting
the skew audit's mean, and negative session gaps reversing the chunk-merge
walk order.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, n=40, d=8, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.normal(size=d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_train_ivf_raises_when_modal_length_starves_init(spark):
    """Mixed-dim corpus where fewer than k vectors share the modal length:
    farthest-first would silently duplicate centroid 0 — must raise."""
    from sdk_spark.operators.similarity import train_ivf_centroids

    # modal length 8 holds only 3 vectors (< k=4); the 2-dim ragged pair
    # keeps the PRE-filter count at 5 >= k so only the new post-filter
    # guard can catch the starvation
    rows = [(i, [float(i)] * 8) for i in range(3)]
    rows += [(10 + i, [float(i), 1.0]) for i in range(2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="modal length"):
        train_ivf_centroids(df, k=4, iters=1)


def test_train_ivf_clean_corpus_unaffected(spark):
    from sdk_spark.operators.similarity import train_ivf_centroids

    C = train_ivf_centroids(_emb(spark), k=4, iters=2)
    assert C.shape == (4, 8)
    # spread-out init + dedup guard: no duplicated centroids
    assert len({tuple(np.round(c, 9)) for c in C}) == 4


def test_append_ann_index_rejects_wrong_dim(spark, tmp_path):
    """An append whose embeddings have a different dimensionality than the
    index was built with must fail the write loudly, not bucket every new
    row as 0 / cell -1 where no narrowed probe ever finds it."""
    from sdk_spark.operators.similarity import (
        append_ann_index, write_ann_index)

    path = str(tmp_path / "idx")
    write_ann_index(_emb(spark), path, n_planes=4, dim=8)
    bad = _emb(spark, n=5, d=16, seed=7) \
        .withColumn("vec_id", F.col("vec_id") + 1000)
    with pytest.raises(Exception, match="!= index dim 8"):
        append_ann_index(bad, path)
    # right-dim appends still work after the failed attempt
    good = _emb(spark, n=5, d=8, seed=9) \
        .withColumn("vec_id", F.col("vec_id") + 2000)
    append_ann_index(good, path)
    assert spark.read.parquet(path).count() == 45


def test_cell_stats_exclude_sentinel_from_mean(spark, tmp_path):
    """The unprobed ivf_cell=-1 junk partition is reported (NULL vs_mean)
    but must not shift the mean real cells are judged against."""
    from sdk_spark.operators.similarity import ann_index_cell_stats

    path = str(tmp_path / "idx")
    rows = ([(i, 0) for i in range(10)] + [(100 + i, 1) for i in range(30)]
            + [(900 + i, -1) for i in range(400)])
    spark.createDataFrame(rows, "vec_id long, ivf_cell int") \
        .write.partitionBy("ivf_cell").parquet(path)
    got = {r["ivf_cell"]: r for r in ann_index_cell_stats(spark, path)
           .collect()}
    assert got[-1]["n"] == 400 and got[-1]["vs_mean"] is None
    # mean over real cells = (10 + 30) / 2 = 20, NOT (10+30+400)/3
    assert got[0]["vs_mean"] == pytest.approx(0.5)
    assert got[1]["vs_mean"] == pytest.approx(1.5)


def _nest_allof(leaf: dict, levels: int) -> dict:
    node = leaf
    for _ in range(levels):
        node = {"type": "object", "allOf": [node]}
    return node


def test_cond_prop_names_depth_cutoff_is_none_not_empty(spark):
    """A conditional subtree nested past the 8-level enumeration walk has
    UNKNOWN reach: ``_cond_prop_names`` must say so (None → historical
    every-column struct), not return set() and silently drop the deep
    branch's property names from the struct its checks compile against."""
    from sdk_spark.compiler.core import CompiledSchema

    meta = "https://json-structure.org/meta/extended/v0/#"
    uses = ["JSONStructureValidation", "JSONStructureConditionalComposition"]
    base = {"$schema": meta, "name": "Deep", "$uses": uses,
            "type": "object", "properties": {"n": {"type": "int32"}}}
    leaf = {"type": "object", "required": ["x"]}
    shallow = dict(base, allOf=[_nest_allof(leaf, 3)])
    deep = dict(base, allOf=[_nest_allof(leaf, 10)])

    plan_s = CompiledSchema(shallow, extended=True)
    assert "x" in plan_s._cond_prop_names(shallow)
    plan_d = CompiledSchema(deep, extended=True)
    assert plan_d._cond_prop_names(deep) is None

    # end-to-end: the deep branch's required:["x"] references a df column
    # that is NOT a root property — nesting depth must not change verdicts
    # (pre-fix the 10-deep plan compiled required-x to lit(False): every
    # row invalid)
    df = spark.createDataFrame([(1, "ok"), (2, None)], "n int, x string")
    got_s = {r["n"]: r["valid"] for r in plan_s.validate(df).collect()}
    got_d = {r["n"]: r["valid"] for r in plan_d.validate(df).collect()}
    assert got_s == got_d == {1: True, 2: False}


def test_unique_violations_explicit_threshold_probes_under_aqe(spark):
    """A caller-supplied non-default broadcast_threshold is a row-cap
    contract: it must engage the counted probe even when the session's
    default strategy resolves to the probe-free AQE path (whose only guard
    is the byte-based autoBroadcastJoinThreshold, not the caller's cap)."""
    from sdk_spark.operators.table_checks import (
        release_probe_cache, unique_violations)

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = spark.createDataFrame(
        [(i % 5,) for i in range(50)] + [(99,)], "k int")
    try:
        # default AQE path first (once the probe persists the dup set, the
        # cache manager substitutes it into every later plan-equal subtree)
        default = unique_violations(df, ["k"])
        assert "InMemoryRelation" not in \
            default._jdf.queryExecution().optimizedPlan().toString()
        # explicit cap → counted probe persists the dup set
        probed = unique_violations(df, ["k"], broadcast_threshold=9_999)
        assert "InMemoryRelation" in \
            probed._jdf.queryExecution().optimizedPlan().toString()
        rows_p = sorted((r["k"], r["multiplicity"]) for r in probed.collect())
        rows_d = sorted((r["k"], r["multiplicity"]) for r in default.collect())
        assert rows_p == rows_d and len(rows_p) == 50
    finally:
        release_probe_cache()


def test_split_bucket_oracle_twin_pmod_parity_on_negative_keys(spark):
    """The driver oracle's SQL twin of split_bucket must use the double-mod
    pmod form the operator documents — DuckDB's bare % keeps the dividend
    sign and buckets negative keys differently (r5 review finding; latent
    on the non-negative TPC-H-ish fixtures, live for xxhash64-derived
    keys which are ~50% negative)."""
    import duckdb

    from sdk_spark.operators.packing import split_bucket

    ids = [i * 7 - 1000 for i in range(300)]          # mixed-sign keys
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    engine = {r["doc_id"]: r["b"] for r in
              df.select("doc_id", split_bucket(F.col("doc_id")).alias("b"))
                .collect()}
    twin = duckdb.sql("""
        SELECT doc_id,
               ((((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761)
                 % 4294967296) * 100) >> 32 AS b
        FROM (SELECT unnest($ids) AS doc_id)
    """.replace("$ids", str(ids))).df()
    oracle = dict(zip(twin["doc_id"], twin["b"]))
    assert engine == oracle


def test_duplicate_keys_hash_prefilter_exact_parity(spark):
    """The 8-byte-hash discovery shuffle must return EXACTLY the same
    duplicate set as the full-key shuffle — planted dups, NULL keys, and
    a multi-key grouping all included."""
    from sdk_spark.operators.table_checks import duplicate_keys

    rows = ([(f"u{i}", i % 3) for i in range(200)]        # unique u*
            + [("dup", 1)] * 5 + [(None, 2)] * 3          # planted + NULLs
            + [("dup", 2)] * 2)
    df = spark.createDataFrame(rows, "k string, g int")
    for keys in (["k"], ["k", "g"]):
        plain = {tuple(r) for r in duplicate_keys(df, keys).collect()}
        fast = {tuple(r) for r in duplicate_keys(
            df, keys, hash_prefilter=True).collect()}
        assert plain == fast and plain
    assert (None, 3) in {(r["k"], r["cnt"])
                         for r in duplicate_keys(df, ["k"],
                                                 hash_prefilter=True).collect()}


def test_sessionize_negative_gap_matches_legacy(spark):
    """gap < 0 must fall back to the legacy plan (chunk ids would decrease
    with time and the merge window would walk chunks in reverse)."""
    from sdk_spark.operators.sessions import sessionize

    rows = [("u", 1_700_000_000 + 60 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "user string, ts long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    legacy = sessionize(df, "user", "ts", gap_minutes=-5, chunk_gaps=None) \
        .select("ts", "session_id").collect()
    chunked = sessionize(df, "user", "ts", gap_minutes=-5, chunk_gaps=64) \
        .select("ts", "session_id").collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, legacy))
    # negative gap: nothing merges — one session per event
    assert len({r["session_id"] for r in legacy}) == 8
