"""Schema exporter (StructType/dataclass → JSON Structure) and auto-path tests."""

from __future__ import annotations

import dataclasses
from typing import Optional

import pytest

from sdk_spark.schema.export import schema_from_dataclass, schema_from_struct_type
from sdk_spark.schema.validator import SchemaChecker


@dataclasses.dataclass
class Img:
    image_id: str
    w: int
    caption: Optional[str]
    tags: list[str]
    meta: dict[str, str] = dataclasses.field(default_factory=dict)


def test_dataclass_export_roundtrip():
    doc = schema_from_dataclass(Img)
    assert not SchemaChecker(extended=True).validate(doc)
    assert doc["properties"]["tags"] == {"type": "array",
                                         "items": {"type": "string"}}
    assert doc["properties"]["meta"] == {"type": "map",
                                         "values": {"type": "string"}}
    assert doc["required"] == ["image_id", "w", "tags"]
    # exported schema must compile on the Catalyst path
    from sdk_spark.compiler.core import CompiledSchema

    st = CompiledSchema(doc, extended=True).struct_type()
    assert [f.name for f in st.fields] == ["image_id", "w", "caption", "tags", "meta"]


def test_struct_type_export(spark):
    df = spark.range(1).select("id").withColumnRenamed("id", "a")
    doc = schema_from_struct_type(df.schema)
    assert not SchemaChecker(extended=True).validate(doc)
    assert doc["properties"]["a"] == {"type": "int64"}


def test_validate_auto_catalyst_path(spark):
    from sdk_spark.plans.auto import validate_auto

    doc = schema_from_dataclass(Img)
    doc["properties"]["w"]["minimum"] = 1
    df = spark.createDataFrame(
        [("a", 5, "cap", ["t"], {}), ("b", 0, None, [], {})],
        "image_id string, w long, caption string, tags array<string>, meta map<string,string>")
    viol, path = validate_auto(df, doc, ["image_id"])
    assert path == "catalyst"
    got = {(r["image_id"], r["constraint_id"]) for r in viol.collect()}
    assert ("b", "INSTANCE_NUMBER_MINIMUM") in got


def test_validate_auto_arrow_fallback(spark):
    from sdk_spark.plans.auto import validate_auto

    # heterogeneous union the typed compiler cannot bind to one column type
    doc = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://x/u", "name": "U",
        "type": "object",
        "properties": {"v": {"type": "choice",
                             "choices": {"s": {"type": "string"},
                                         "n": {"type": "int32"}}}},
    }
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    viol, path = validate_auto(df, doc, ["id"])
    assert path == "arrow"
    assert viol.count() >= 1  # "x" is not a choice object


def test_validate_json_auto_additional_properties(spark):
    """Open-object enforcement on the raw-JSON Catalyst path: undeclared
    keys violate INSTANCE_ADDITIONAL_PROPERTY via json_object_keys, exactly
    like the row kernel (kernel parity asserted in the same test)."""
    import json as _json

    from sdk_spark.plans.auto import validate_json_auto
    from sdk_spark.rowcheck import RowChecker

    meta = "https://json-structure.org/meta/extended/v0/#"
    schema = {"$schema": meta, "$id": "https://t.local/ap", "name": "Ap",
              "$uses": ["JSONStructureValidation"],
              "type": "object",
              "properties": {"a": {"type": "int32", "minimum": 0},
                             "b": {"type": "string"}},
              "required": ["a"],
              "additionalProperties": False}
    docs = [
        {"a": 1, "b": "x"},                      # valid
        {"a": 1, "b": "x", "zz": 9},             # additional property
        {"a": -5, "extra": True, "more": None},  # range + 2 additional
        {"$schema": meta, "a": 2},               # reserved key: exempt
    ]
    df = spark.createDataFrame(
        [(i, _json.dumps(d)) for i, d in enumerate(docs)],
        "rid long, doc string")
    viol, path = validate_json_auto(df, "doc", schema, key_cols=["rid"])
    assert path == "catalyst"
    got = {}
    for r in viol.collect():
        got.setdefault(r["rid"], set()).add((r["constraint_id"], r["path"]))
    kernel = RowChecker(schema, extended=True)
    for i, d in enumerate(docs):
        expected = {(f.code, f.path) for f in kernel.check(d)}
        assert got.get(i, set()) == expected, (i, got.get(i), expected)


def test_validate_json_with_instance_uses(spark):
    """Per-batch instance-$uses: one compiled plan per distinct $uses set,
    kernel-differential on every row (reference: instance_validator.py:321-324,
    146-160)."""
    import json as _json

    from sdk_spark.plans.auto import validate_json_with_instance_uses
    from sdk_spark.rowcheck import RowChecker

    meta_ext = "https://json-structure.org/meta/extended/v0/#"
    schema = {"$schema": meta_ext, "$id": "https://t.local/uses", "name": "U",
              "$uses": ["JSONStructureValidation"],
              "$offers": {"Extra": {"properties":
                                    {"x": {"type": "int32", "minimum": 10}}}},
              "type": "object",
              "properties": {"v": {"type": "int32", "minimum": 10}}}
    docs = [
        {"v": 15, "x": 5},                          # no $uses: x is ignored
        {"$uses": ["Extra"], "v": 15, "x": 5},      # add-in on: x violates
        {"$uses": ["Extra"], "v": 15, "x": 50},     # add-in on: valid
        {"$uses": ["NotOffered"], "v": 15},         # unknown add-in
        {"v": 5},                                   # base violation
    ]
    df = spark.createDataFrame(
        [(i, _json.dumps(d)) for i, d in enumerate(docs)],
        "rid long, doc string")
    viol, mode = validate_json_with_instance_uses(df, "doc", schema,
                                                  key_cols=["rid"])
    assert mode == "catalyst"
    got = {}
    for r in viol.collect():
        got.setdefault(r["rid"], set()).add(r["constraint_id"])
    # kernel differential: per-row $uses must agree
    rc = RowChecker(schema, extended=True)
    for i, d in enumerate(docs):
        codes = {f.code for f in rc.check(d)}
        assert got.get(i, set()) == codes, (i, got.get(i), codes)
    assert got[1] == {"INSTANCE_NUMBER_MINIMUM"}
    assert got[3] == {"INSTANCE_USES_NOT_OFFERED"}


def test_instance_uses_builtin_on_core_schema(spark):
    """Requesting a built-in keyword family via instance $uses against a
    core-metaschema root is INSTANCE_ADDIN_NOT_SUPPORTED (kernel parity)."""
    import json as _json

    from sdk_spark.plans.auto import validate_json_with_instance_uses
    from sdk_spark.rowcheck import RowChecker

    schema = {"$schema": "https://json-structure.org/meta/core/v0/#",
              "$id": "https://t.local/core", "name": "C",
              "type": "object",
              "properties": {"v": {"type": "int32"}}}
    docs = [{"v": 1}, {"$uses": ["JSONStructureValidation"], "v": 1}]
    df = spark.createDataFrame(
        [(i, _json.dumps(d)) for i, d in enumerate(docs)],
        "rid long, doc string")
    viol, _mode = validate_json_with_instance_uses(df, "doc", schema,
                                                   key_cols=["rid"])
    got = {}
    for r in viol.collect():
        got.setdefault(r["rid"], set()).add(r["constraint_id"])
    rc = RowChecker(schema, extended=False)
    for i, d in enumerate(docs):
        codes = {f.code for f in rc.check(d)}
        assert got.get(i, set()) == codes, (i, got.get(i), codes)
    assert got[1] == {"INSTANCE_ADDIN_NOT_SUPPORTED"}
