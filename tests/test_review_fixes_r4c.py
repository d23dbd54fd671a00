"""Round-4 third review sweep: compiler + table-check edge-case regressions.

Each test pins a confirmed defect from the high-effort review of
``compiler/core.py`` and ``operators/table_checks.py``:

* int128/uint128 bounds over decimal(38,0) columns built 39-digit literals
  that overflow decimal — ArithmeticException under ANSI, or NULL→false
  violations otherwise.  decimal(38,0) can never exceed int128's range.
* ``unique_violations`` rejoined duplicates with a non-null-safe join while
  ``duplicate_keys`` groups NULL keys — NULL-key duplicates silently
  vanished from the violation rows (the DuckDB window oracle counts them).
* ``psi_drift``'s equi full_outer split a NULL bucket present on both
  sides into two disjoint rows → spurious drift on identical data.
* non-scalar const/enum raised an opaque py4j SparkRuntimeException
  instead of SchemaCompileError, so ``validate_auto`` crashed instead of
  rerouting to the Arrow kernel (which handles deep equality).
* ``column_profile`` spliced raw column names into stack() SQL — names
  with spaces/quotes threw ParseException.
* ``fk_orphans`` reported NULL-fk rows as orphans, contradicting SQL
  MATCH SIMPLE semantics and the module's NULL-passes design rule (the
  DuckDB NOT IN oracle already excludes NULLs).
* string-backed decimal bounds lacked the malformed-input guard the
  int-backed path has → 'abc' double-reported format + every bound.
* top-level propertyNames/minProperties scope to schema-declared columns
  while the nested-struct path sees every field — adjudicated as an
  INTENTIONAL divergence (root DataFrames carry out-of-instance metadata
  columns: keys, partitions, case ids) and now documented + pinned.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _sch(t, extra=None, uses=None):
    node = {"type": t, **(extra or {})}
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R", "properties": {"v": node}}
    if uses:
        doc["$uses"] = uses
    return doc


def _violations(spark, doc, df):
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    return violation_rows(CompiledSchema(doc).validate(df), [])


def test_int128_bounds_over_decimal38_never_flag_or_crash(spark):
    df = spark.createDataFrame(
        [("99999999999999999999999999999999999999",),
         ("-99999999999999999999999999999999999999",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    assert _violations(spark, _sch("int128"), df).count() == 0


def test_uint128_over_decimal38_checks_only_the_negative_side(spark):
    df = spark.createDataFrame([("-5",), ("5",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    rows = _violations(spark, _sch("uint128"), df).collect()
    assert len(rows) == 1 and rows[0]["value"] == "-5"


def test_int64_over_decimal38_still_range_checked(spark):
    df = spark.createDataFrame([("9223372036854775808",), ("5",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    assert _violations(spark, _sch("int64"), df).count() == 1


def test_unique_violations_keeps_null_key_duplicates(spark):
    from sdk_spark.operators.table_checks import (duplicate_keys,
                                                  unique_violations)
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (1, "d"), (2, "e")],
        "k int, x string")
    groups = {r["k"]: r["cnt"] for r in duplicate_keys(df, ["k"]).collect()}
    assert groups == {None: 2, 1: 2}
    rows = unique_violations(df, ["k"]).collect()
    assert len(rows) == 4  # both members of both duplicate groups
    assert sum(1 for r in rows if r["k"] is None) == 2


def test_psi_drift_identical_snapshots_with_null_buckets_is_zero(spark):
    from sdk_spark.operators.table_checks import psi_drift
    df = spark.createDataFrame(
        [(float(x),) for x in (1, 2, 3)] + [(None,)] * 3, "x double")
    rows = psi_drift(df, df, F.floor(F.col("x"))).collect()
    assert len(rows) == 4  # buckets 1,2,3 and ONE merged NULL bucket
    assert abs(sum(r["psi_contrib"] for r in rows)) < 1e-12


def test_non_scalar_const_enum_raise_schema_compile_error(spark):
    from sdk_spark.compiler.core import CompiledSchema, SchemaCompileError
    base = {"$id": "https://x/s",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "type": "object", "name": "R"}
    obj = {"type": "object", "name": "V",
           "properties": {"a": {"type": "int32"}}}
    with pytest.raises(SchemaCompileError, match="non-scalar const"):
        CompiledSchema({**base, "properties": {"v": {**obj, "const": {"a": 1}}}}) \
            .validate(spark.createDataFrame([((1,),)], "v struct<a:int>"))
    with pytest.raises(SchemaCompileError, match="non-scalar enum"):
        CompiledSchema({**base,
                        "properties": {"v": {**obj, "enum": [{"a": 1}]}}}) \
            .validate(spark.createDataFrame([((1,),)], "v struct<a:int>"))


def test_validate_auto_reroutes_non_scalar_const_to_arrow(spark):
    from sdk_spark.plans.auto import validate_auto
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R",
           "properties": {"v": {"type": "object", "name": "V",
                                "properties": {"a": {"type": "int32"}},
                                "const": {"a": 1}},
                          "id": {"type": "string"}}}
    df = spark.createDataFrame([((1,), "k1"), ((2,), "k2")],
                               "v struct<a:int>, id string")
    viol, path = validate_auto(df, doc, ["id"])
    assert path == "arrow"
    rows = viol.collect()
    assert len(rows) == 1 and rows[0]["id"] == "k2"


def test_column_profile_handles_hostile_column_names(spark):
    from sdk_spark.operators.table_checks import column_profile
    df = spark.createDataFrame([(1, "x"), (2, None)], ["image size", "it's"])
    got = {r["column"]: r["nulls"] for r in column_profile(df).collect()}
    assert got == {"image size": 0, "it's": 1}


def test_fk_orphans_null_fk_is_not_an_orphan(spark):
    from sdk_spark.operators.table_checks import fk_orphans
    fact = spark.createDataFrame([(1,), (None,), (99,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    assert [r["fk"] for r in fk_orphans(fact, ["fk"], dim, ["pk"]).collect()] \
        == [99]


def test_malformed_decimal_string_reports_format_only(spark):
    doc = _sch("decimal", {"minimum": 1},
               uses=["JSONStructureValidation"])
    df = spark.createDataFrame([("abc",), ("0.5",), ("2.0",)], "v string")
    codes = sorted(r["constraint_id"]
                   for r in _violations(spark, doc, df).collect())
    assert codes == ["INSTANCE_DECIMAL_FORMAT_INVALID",
                     "INSTANCE_NUMBER_MINIMUM"]


def test_toplevel_scopes_to_declared_nested_checks_every_field(spark):
    """Documented root/nested divergence for propertyNames/maxProperties:
    at root, undeclared DataFrame columns are out-of-instance metadata
    (key/partition/case-id columns) and are NOT counted or name-checked;
    a nested struct is fully instance-typed, so every field is."""
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    base = {"$id": "https://x/s",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "$uses": ["JSONStructureValidation"]}
    inner = {"type": "object", "name": "V",
             "properties": {"good": {"type": "int32"}},
             "propertyNames": {"type": "string", "pattern": "^[a-z]+$"},
             "maxProperties": 1}
    flat = spark.createDataFrame([(1, 2)], ["good", "Bad Name"])
    top = violation_rows(
        CompiledSchema({**base, **inner, "name": "R"}).validate(flat), [])
    assert top.count() == 0  # metadata column neither counted nor name-checked
    nested_df = spark.createDataFrame([((1, 2),)],
                                      "v struct<good:int, `Bad Name`:int>")
    nested = violation_rows(
        CompiledSchema({**base, "type": "object", "name": "R",
                        "properties": {"v": inner}}).validate(nested_df), [])
    nested_codes = sorted(r["constraint_id"] for r in nested.collect())
    assert "INSTANCE_PROPERTY_NAME_INVALID" in nested_codes
    assert "INSTANCE_MAX_PROPERTIES" in nested_codes
