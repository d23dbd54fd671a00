"""Catalyst-path coverage for compile-time graph operators:
$ref inlining, $extends flattening, $root redirection, $import merging,
choice structs, unions, and conditional composition — each differentially
checked against the pure-Python row kernel on the same instances.
"""

from __future__ import annotations

import pytest

from sdk_spark.compiler.core import CompiledSchema
from sdk_spark.rowcheck import RowChecker
from sdk_spark.schema.normalize import SchemaCompileError, import_defs
from sdk_spark.sources.ingest import instances_df

META = "https://json-structure.org/meta/extended/v0/#"


def check_both(spark, schema, instances, scalar_root=False):
    """Run instances through Catalyst AND the row kernel; verdicts must agree."""
    plan = CompiledSchema(schema, extended=True)
    df = instances_df(spark, plan.struct_type(), instances, scalar_root,
                      case_ids=[str(i) for i in range(len(instances))])
    got = {int(r["case_id"]): r["valid"] for r in plan.validate(df).collect()}
    rc = RowChecker(schema, extended=True)
    for i, inst in enumerate(instances):
        kernel_valid = rc.is_valid(inst)
        assert got[i] == kernel_valid, (
            f"case {i}: catalyst={got[i]} kernel={kernel_valid} inst={inst}")
    return got


def test_ref_inlining(spark):
    schema = {
        "$schema": META, "$id": "https://x/r", "name": "R",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"addr": {"type": {"$ref": "#/definitions/Address"}}},
        "definitions": {
            "Address": {"type": "object",
                        "properties": {"zip": {"type": "string",
                                               "pattern": "^[0-9]{5}$"}}},
        },
    }
    got = check_both(spark, schema, [
        {"addr": {"zip": "12345"}},
        {"addr": {"zip": "abc"}},
        {},  # absent optional property (absent ≡ NULL in columnar storage)
    ])
    assert got[0] and not got[1] and got[2]


def test_extends_flattening(spark):
    schema = {
        "$schema": META, "$id": "https://x/e", "name": "E",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "$extends": "#/definitions/Base",
        "properties": {"extra": {"type": "string", "minLength": 2}},
        "required": ["extra"],
        "definitions": {
            "Base": {"type": "object",
                     "properties": {"base_id": {"type": "int32", "minimum": 0}},
                     "required": ["base_id"]},
        },
    }
    got = check_both(spark, schema, [
        {"base_id": 5, "extra": "ok"},
        {"base_id": -1, "extra": "ok"},   # inherited minimum violated
        {"extra": "ok"},                  # inherited required violated
        {"base_id": 5, "extra": "x"},     # own minLength violated
    ])
    assert got[0] and not got[1] and not got[2] and not got[3]


def test_root_redirect(spark):
    schema = {
        "$schema": META, "$id": "https://x/root", "name": "Rt",
        "$uses": ["JSONStructureValidation"],
        "$root": "#/definitions/Thing",
        "definitions": {
            "Thing": {"type": "object",
                      "properties": {"n": {"type": "int32", "maximum": 10}}},
        },
    }
    got = check_both(spark, schema, [{"n": 5}, {"n": 50}])
    assert got[0] and not got[1]


def test_import_merge(spark):
    external = {
        "$schema": META, "$id": "https://other/types", "name": "Money",
        "type": "object",
        "properties": {"amount": {"type": "double", "minimum": 0}},
        "definitions": {
            "Currency": {"type": "string", "enum": ["USD", "EUR"]},
        },
    }
    schema = {
        "$schema": META, "$id": "https://x/i", "name": "I",
        "$uses": ["JSONStructureValidation"],
        "$import": "https://other/types",
        "type": "object",
        "properties": {"ccy": {"type": {"$ref": "#/definitions/Currency"}}},
    }
    merged = import_defs(schema, {"https://other/types": external})
    assert "Currency" in merged["definitions"]
    plan = CompiledSchema(schema, extended=True,
                          external_schemas=[external])
    df = instances_df(spark, plan.struct_type(), [{"ccy": "USD"}, {"ccy": "GBP"}],
                      False, case_ids=["0", "1"])
    got = {r["case_id"]: r["valid"] for r in plan.validate(df).collect()}
    # reference parity: the type:{$ref} merge copies type/properties/required
    # but NOT enum/const (reference: instance_validator.py:209-240), so 'GBP'
    # validates as a plain string — both engines agree
    assert got["0"] and got["1"]
    rc = RowChecker(merged, extended=True)
    assert rc.is_valid({"ccy": "GBP"})


def test_choice_tagged_union(spark):
    schema = {
        "$schema": META, "$id": "https://x/c", "name": "C",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {
            "payload": {"type": "choice", "choices": {
                "text": {"type": "string", "minLength": 2},
                "num": {"type": "int32", "minimum": 0},
            }},
        },
    }
    got = check_both(spark, schema, [
        {"payload": {"text": "hi"}},
        {"payload": {"num": 3}},
        {"payload": {"text": "hi", "num": 3}},  # two variants set
        {"payload": {"num": -5}},               # variant constraint violated
    ])
    assert got[0] and got[1] and not got[2] and not got[3]


def test_nullable_union(spark):
    schema = {
        "$schema": META, "$id": "https://x/u", "name": "U",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"v": {"type": ["string", "null"]}},
        "required": ["v"],
    }
    plan = CompiledSchema(schema, extended=True)
    df = instances_df(spark, plan.struct_type(), [{"v": "x"}, {"v": None}, {}],
                      False, case_ids=["0", "1", "2"])
    got = {r["case_id"]: r["valid"] for r in plan.validate(df).collect()}
    # Typed-mode semantics: absent and explicit-null are the same thing in
    # columnar storage, and `required` means IS NOT NULL — so both the
    # explicit null (case 1) and the absent property (case 2) fail required
    # even though "null" is in the union (documented divergence: the
    # reference distinguishes present-null from absent for JSON input).
    assert got["0"] and not got["1"] and not got["2"]


def test_conditionals_on_property(spark):
    schema = {
        "$schema": META, "$id": "https://x/cond", "name": "Cond",
        "$uses": ["JSONStructureValidation", "JSONStructureConditionalComposition"],
        "type": "object",
        "properties": {
            # node-level $uses is REQUIRED for conditionals under the
            # extended metaschema (reference: instance_validator.py:619-625)
            "n": {"type": "int32",
                  "$uses": ["JSONStructureConditionalComposition",
                            "JSONStructureValidation"],
                  "allOf": [{"type": "int32", "minimum": 0},
                            {"type": "int32", "maximum": 100}],
                  "oneOf": [{"type": "int32", "maximum": 49},
                            {"type": "int32", "minimum": 50}]},
        },
    }
    got = check_both(spark, schema, [{"n": 10}, {"n": -5}, {"n": 120}])
    assert got[0] and not got[1] and not got[2]


def test_incompatible_schema_raises(spark):
    schema = {
        "$schema": META, "$id": "https://x/bad", "name": "B",
        "type": "object",
        "properties": {"v": {"type": "int32"}},
    }
    plan = CompiledSchema(schema, extended=True)
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(SchemaCompileError):
        plan.validate(df)


def test_abstract_rejected():
    schema = {
        "$schema": META, "$id": "https://x/a", "name": "A",
        "type": "object", "abstract": True,
        "properties": {"v": {"type": "string"}},
    }
    with pytest.raises(SchemaCompileError):
        CompiledSchema(schema, extended=True)
