"""Round-3 parity additions: CLI --metaschema mode and the exporter
``transform_schema`` callback (VERDICT r2 next-#6/#7)."""

from __future__ import annotations

import dataclasses
import json

from pyspark.sql import types as T

from sdk_spark.cli import main

#: a metaschema-style document: property names start with '$', which the
#: normal identifier rule rejects (reference: json-structure-check
#: --metaschema relaxes it, schema_validator.py:1347-1348)
META_DOC = {
    "$schema": "https://json-structure.org/meta/core/v0/#",
    "$id": "https://t.local/meta",
    "name": "MetaLike",
    "type": "object",
    "properties": {
        "$ref": {"type": "string"},
        "$defs": {"type": "map", "values": {"type": "string"}},
        "name": {"type": "string"},
    },
}


def test_cli_metaschema_flag_relaxes_dollar_identifiers(tmp_path, capsys):
    p = tmp_path / "meta.json"
    p.write_text(json.dumps(META_DOC))
    # without the flag: '$'-prefixed property names are identifier errors
    assert main(["--schema", str(p), "--check-only", "--quiet"]) == 2
    # with the flag: the same document passes the front-end
    assert main(["--schema", str(p), "--check-only", "--quiet",
                 "--metaschema"]) == 0


def test_export_transform_callback_struct_type():
    from sdk_spark.schema.export import schema_from_struct_type

    st = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
    ])
    seen = []

    def xf(ctx, node):
        seen.append((ctx.path, node.get("type")))
        if ctx.path == "#/properties/w":
            return {**node, "minimum": 1}           # user rewrite
        if ctx.path == "#":
            return {**node, "description": "via callback"}
        return node

    doc = schema_from_struct_type(st, transform_schema=xf)
    assert doc["properties"]["w"] == {"type": "int32", "minimum": 1}
    assert doc["description"] == "via callback"
    # callback saw every generated node: both fields and the root
    paths = {p for p, _ in seen}
    assert {"#/properties/image_id", "#/properties/w", "#"} <= paths
    # context carried the producing StructField
    assert doc["properties"]["image_id"]["type"] == "string"


def test_export_transform_callback_dataclass():
    from sdk_spark.schema.export import schema_from_dataclass

    @dataclasses.dataclass
    class Img:
        image_id: str
        tags: list[str]

    def xf(ctx, node):
        if ctx.field is not None and ctx.field.name == "image_id":
            return {**node, "maxLength": 64}
        return node

    doc = schema_from_dataclass(Img, transform_schema=xf)
    assert doc["properties"]["image_id"] == {"type": "string", "maxLength": 64}
    assert doc["properties"]["tags"] == {
        "type": "array", "items": {"type": "string"}}
    assert doc["required"] == ["image_id", "tags"]


def test_export_without_transform_unchanged():
    """Default path (no callback) is byte-identical to before."""
    from sdk_spark.schema.export import schema_from_struct_type

    st = T.StructType([T.StructField("a", T.LongType(), False)])
    doc = schema_from_struct_type(st)
    assert doc["properties"] == {"a": {"type": "int64"}}
    assert doc["required"] == ["a"]


def test_cli_infer_prints_compilable_schema(spark, tmp_path, capsys):
    """--infer profiles a parquet input and prints a draft schema that the
    front-end accepts and the compiler can validate the data with."""
    import json

    from sdk_spark.cli import main
    from sdk_spark.compiler.core import CompiledSchema
    from sdk_spark.schema.validator import SchemaChecker

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, float(i % 9), ["x", "y"][i % 2]) for i in range(60)],
        "id long, v double, tag string").write.parquet(src)
    rc = main(["--infer", "--input", src])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert SchemaChecker(extended=True).validate(doc) == []
    validated = CompiledSchema(doc, extended=True).validate(
        spark.read.parquet(src))
    from pyspark.sql import functions as F
    assert validated.where(~F.col("valid")).count() == 0


def test_cli_infer_requires_input():
    from sdk_spark.cli import main

    assert main(["--infer"]) == 2


def test_cli_schema_still_required_without_infer():
    from sdk_spark.cli import main

    assert main([]) == 2


def test_cli_infer_conflicts_with_schema():
    from sdk_spark.cli import main

    assert main(["--infer", "--schema", "x.json", "--input", "y"]) == 2
