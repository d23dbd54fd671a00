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


# -- second sweep: compiler scoping / packing / cluster checkpoints ----------


def _codes(plan, df):
    row = plan.validate(df).collect()[0]
    return {v["constraint_id"] for v in row["violations"] if v is not None}


def test_pattern_properties_bad_regex_reroutes_to_kernel(spark):
    """An invalid patternProperties regex raises SchemaCompileError (not a
    bare re.error), so validate_auto reroutes to the row kernel instead of
    crashing."""
    from sdk_spark.plans.auto import validate_auto

    schema = {"$schema": "https://json-structure.org/meta/extended/v0/#",
              "$id": "https://t.local/pp", "name": "PP",
              "$uses": ["JSONStructureValidation"], "type": "object",
              "properties": {"a": {"type": "string"}},
              "patternProperties": {"[": {"type": "string"}}}
    df = spark.createDataFrame([(1, "x")], "k long, a string")
    viol, path = validate_auto(df, schema, ["k"])
    assert path == "arrow"
    viol.collect()                                  # and it actually runs


def test_root_has_scopes_to_declared(spark):
    """Root 'has' must not be satisfied by an undeclared metadata column
    (same declared-only scoping as propertyNames/minProperties)."""
    from sdk_spark.compiler.core import CompiledSchema

    schema = {"$schema": "https://json-structure.org/meta/extended/v0/#",
              "$id": "https://t.local/has", "name": "HasT",
              "type": "object",
              "properties": {"n": {"type": "int32"}},
              "has": {"type": "string"}}
    plan = CompiledSchema(schema, extended=True)
    # case_id is a STRING metadata column: before the fix it satisfied
    # 'has' for every row and the violation never fired
    df = spark.createDataFrame([(7, "case-1")], "n int, case_id string")
    assert "INSTANCE_HAS_NO_MATCH" in _codes(plan, df)
    ok = spark.createDataFrame([(7, "s", "case-1")],
                               "n int, s string, case_id string")
    schema2 = dict(schema, properties={"n": {"type": "int32"},
                                       "s": {"type": "string"}})
    assert "INSTANCE_HAS_NO_MATCH" not in _codes(
        CompiledSchema(schema2, extended=True), ok)


def test_toplevel_conditionals_scope_to_declared(spark):
    """Branch-level object checks (maxProperties) count DECLARED properties
    only — a metadata column must not flip the verdict — while branches
    that declare their own properties still bind to the matching columns."""
    from sdk_spark.compiler.core import CompiledSchema

    meta = "https://json-structure.org/meta/extended/v0/#"
    counting = {"$schema": meta, "$id": "https://t.local/c1", "name": "C1",
                "$uses": ["JSONStructureValidation"], "type": "object",
                "properties": {"a": {"type": "int32"},
                               "b": {"type": "int32"}},
                "allOf": [{"type": "object", "maxProperties": 2}]}
    df = spark.createDataFrame([(1, 2, "case-1")],
                               "a int, b int, case_id string")
    assert "INSTANCE_MAX_PROPERTIES" not in _codes(
        CompiledSchema(counting, extended=True), df)

    branch_only = {"$schema": meta, "$id": "https://t.local/c2", "name": "C2",
                   "$uses": ["JSONStructureValidation"], "type": "object",
                   "allOf": [{"type": "object", "properties":
                              {"a": {"type": "int32", "minimum": 5}},
                              "required": ["a"]}]}
    bad = spark.createDataFrame([(1, "case-1")], "a int, case_id string")
    assert "INSTANCE_NUMBER_MINIMUM" in _codes(
        CompiledSchema(branch_only, extended=True), bad)


def test_validate_refuses_output_column_collision(spark):
    from sdk_spark.compiler.core import CompiledSchema

    schema = {"$schema": "https://json-structure.org/meta/extended/v0/#",
              "$id": "https://t.local/vc", "name": "VC", "type": "object",
              "properties": {"a": {"type": "int32"}}}
    df = spark.createDataFrame([(1, True)], "a int, valid boolean")
    with pytest.raises(ValueError, match="valid"):
        CompiledSchema(schema, extended=True).validate(df)


def test_multipleof_string_backed_parse_failure_single_report(spark):
    """Kernel-parity pin: an unparseable string-backed int64 under
    multipleOf reports FORMAT_INVALID alone on BOTH paths — the kernel
    parses the digit string first and skips numeric addins on failure, so
    the Catalyst plan guards multipleOf like the bounds (r5 sweep); a
    VALID digit string still gets the multipleOf verdict."""
    from sdk_spark.compiler.core import CompiledSchema
    from sdk_spark.rowcheck import RowChecker

    schema = {"$schema": "https://json-structure.org/meta/extended/v0/#",
              "$id": "https://t.local/mo", "name": "MO", "type": "object",
              "$uses": ["JSONStructureValidation"],
              "properties": {"v": {"type": "int64", "multipleOf": 5}}}
    plan = CompiledSchema(schema, extended=True)
    df = spark.createDataFrame([("abc", 1)], "v string, k long")
    got = _codes(plan, df)
    assert "INSTANCE_NUMBER_FORMAT_INVALID" in got
    assert "INSTANCE_NUMBER_MULTIPLE_OF" not in got
    kernel = {f.code for f in
              RowChecker(schema, extended=True).check({"v": "abc"})}
    assert "INSTANCE_NUMBER_MULTIPLE_OF" not in kernel
    bad = spark.createDataFrame([("7", 1)], "v string, k long")
    assert "INSTANCE_NUMBER_MULTIPLE_OF" in _codes(plan, bad)


def test_int128_over_long_compiles_no_dead_constraint(spark):
    from sdk_spark.compiler.core import CompiledSchema

    schema = {"$schema": "https://json-structure.org/meta/extended/v0/#",
              "$id": "https://t.local/i128", "name": "I128",
              "type": "object", "properties": {"v": {"type": "int128"}}}
    df = spark.createDataFrame([(5,)], "v long")
    plan = CompiledSchema(schema, extended=True)
    ids = [c.cid for c in plan.constraints(df)]
    assert "INSTANCE_NUMBER_OUT_OF_RANGE" not in ids
    # uint128 keeps exactly the >= 0 side
    u = dict(schema, properties={"v": {"type": "uint128"}},
             **{"$id": "https://t.local/u128"})
    ids_u = [c.cid for c in
             CompiledSchema(u, extended=True).constraints(df)]
    assert ids_u.count("INSTANCE_NUMBER_OUT_OF_RANGE") == 1


def test_hash_split_null_key_lands_in_first_band(spark):
    from sdk_spark.operators.packing import hash_split

    df = spark.createDataFrame([(None,), (1,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in
           hash_split(df, "doc_id",
                      {"train": 80, "valid": 10, "test": 10}).collect()}
    assert got[None] == "train"
    assert all(v is not None for v in got.values())


def test_pack_rows_negative_tokens_fail_closed(spark):
    from sdk_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 100), (2, -50)],
                               "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative token count"):
        pack_sequences(df, max_tokens=200, num_partitions=1) \
            .collect()


def test_cc_reliable_checkpoint_cleans_superseded_rounds(spark, tmp_path):
    """With a checkpoint dir, superseded round snapshots are deleted as
    soon as the next round is durable — at most ONE round directory
    remains per run (r5 review finding: DataFrame.checkpoint files
    accumulated O(rounds) for the app lifetime)."""
    import os

    from sdk_spark.operators.cluster import connected_components

    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (9, 1)],
            "id_a long, id_b long")
        got = {(r["id"], r["cluster_id"])
               for r in connected_components(pairs).collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (9, 1),
                       (5, 5), (6, 5), (7, 5)}
        round_dirs = [os.path.join(r, d) for r, ds, _ in os.walk(ckdir)
                      for d in ds if d.startswith("round_")]
        assert len(round_dirs) == 1, round_dirs
    finally:
        scala_none = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)
