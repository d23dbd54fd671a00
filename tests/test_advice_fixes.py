"""Regression tests for round-1 advisor findings (ADVICE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_schema_checker_reuse_resets_enabled():
    """A checker reused across documents must not leak $uses enablement."""
    from sdk_spark.schema.validator import SchemaChecker

    with_uses = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/a", "name": "A",
        "$uses": ["JSONStructureValidation"],
        "type": "string", "minLength": 1,
    }
    without_uses = {
        "$schema": "https://json-structure.org/meta/core/v0/#",
        "$id": "https://t.local/b", "name": "B",
        "type": "string", "minLength": 1,
    }
    checker = SchemaChecker(extended=True)
    fresh = SchemaChecker(extended=True)
    baseline = fresh.validate(without_uses)
    checker.validate(with_uses)
    reused = checker.validate(without_uses)
    assert [(i.code, i.path) for i in reused] == \
           [(i.code, i.path) for i in baseline]


def test_manifest_resume_revalidates_on_schema_change(spark, tmp_path):
    """Partitions committed under an old schema fingerprint are NOT skipped
    when the schema changes."""
    from sdk_spark.streaming.manifest import (
        run_resumable,
        validate_partition_metrics,
    )
    from sdk_spark.compiler.core import CompiledSchema, violation_rows

    df = spark.createDataFrame(
        [(d, i, float(i % 50)) for d in ("d1", "d2") for i in range(20)],
        "day string, rid long, v double")
    manifest = str(tmp_path / "manifest")
    out = str(tmp_path / "viol")

    def make_fn(schema_doc):
        def fn(pdf):
            validated = CompiledSchema(schema_doc, extended=True).validate(pdf)
            return (violation_rows(validated, ["rid"]),
                    validate_partition_metrics(validated))
        return fn

    meta = "https://json-structure.org/meta/extended/v0/#"
    s1 = {"$schema": meta, "$id": "https://t.local/s", "name": "S",
          "$uses": ["JSONStructureValidation"], "type": "object",
          "properties": {"v": {"type": "double", "maximum": 100}}}
    s2 = {**s1, "properties": {"v": {"type": "double", "maximum": 10}}}

    r1 = run_resumable(spark, df, "day", manifest, out, make_fn(s1),
                       schema_doc=s1)
    assert sorted(r1.processed) == ["d1", "d2"]
    # same schema: everything skipped
    r2 = run_resumable(spark, df, "day", manifest, out, make_fn(s1),
                       schema_doc=s1)
    assert r2.processed == [] and sorted(r2.skipped) == ["d1", "d2"]
    # changed schema: fingerprint differs -> both partitions re-validated
    r3 = run_resumable(spark, df, "day", manifest, out, make_fn(s2),
                       schema_doc=s2)
    assert sorted(r3.processed) == ["d1", "d2"]


def test_jsonbatch_null_doc_and_key_order(spark):
    from sdk_spark.operators.jsonbatch import json_verdicts, validate_json_column

    meta = "https://json-structure.org/meta/extended/v0/#"
    schema = {"$schema": meta, "$id": "https://t.local/j", "name": "J",
              "type": "object",
              "properties": {"k": {"type": "int32"}}, "required": ["k"]}
    df = spark.createDataFrame(
        [(1, "a", '{"k": 1}'), (2, "b", None), (3, "c", '{"k": "x"}')],
        "rid long, tag string, doc string")

    # NULL doc -> INSTANCE_TYPE_MISMATCH (same semantic as json_verdicts)
    viol = validate_json_column(df, "doc", schema, key_cols=["rid"]).collect()
    codes = {r["rid"]: r["constraint_id"] for r in viol}
    assert codes[2] == "INSTANCE_TYPE_MISMATCH"
    assert 1 not in codes
    verd = {r["rid"]: r["valid"]
            for r in json_verdicts(df, "doc", schema).collect()}
    assert verd == {1: True, 2: False, 3: False}

    # key_cols in non-DataFrame order: values must land under the right names
    viol2 = validate_json_column(df, "doc", schema,
                                 key_cols=["tag", "rid"]).collect()
    row = next(r for r in viol2 if r["constraint_id"] == "INSTANCE_TYPE_MISMATCH")
    assert row["tag"] == "b" and row["rid"] == 2
