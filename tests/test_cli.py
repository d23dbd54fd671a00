"""CLI (spark-submit entry) smoke test over a generated image table."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F


def test_cli_resumable_run(spark, tmp_path, capsys):
    from sdk_spark.cli import main
    from sdk_spark.sources.images import IMAGE_STRUCT_SCHEMA, generate_images

    src = str(tmp_path / "images")
    df = generate_images(spark, 200, partitions=4)
    # add a partition column for checkpoint granularity
    df.withColumn("pdate", F.concat(F.lit("d"), (F.crc32("image_id") % 3)
                                    .cast("string"))) \
      .write.partitionBy("pdate").parquet(src)

    schema_file = tmp_path / "images.struct.json"
    schema_file.write_text(json.dumps(IMAGE_STRUCT_SCHEMA))

    rc = main([
        "--schema", str(schema_file),
        "--input", src,
        "--violations", str(tmp_path / "viol"),
        "--manifest", str(tmp_path / "manifest"),
        "--partition-col", "pdate",
        "--unique-key", "image_id",
    ])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out1["processed"]) == ["d0", "d1", "d2"]

    viol = spark.read.parquet(str(tmp_path / "viol"))
    codes = {r["constraint_id"] for r in viol.select("constraint_id").distinct().collect()}
    assert "INSTANCE_UUID_FORMAT_INVALID" in codes
    assert "ENGINE_UNIQUE_VIOLATION" in codes

    # second invocation: everything committed → nothing recomputed
    rc = main([
        "--schema", str(schema_file),
        "--input", src,
        "--violations", str(tmp_path / "viol"),
        "--manifest", str(tmp_path / "manifest"),
        "--partition-col", "pdate",
        "--unique-key", "image_id",
    ])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["processed"] == []
    assert sorted(out2["skipped_committed"]) == ["d0", "d1", "d2"]


def test_cli_rejects_invalid_schema(tmp_path, capsys):
    from sdk_spark.cli import main

    bad = tmp_path / "bad.struct.json"
    bad.write_text(json.dumps({"type": "object"}))  # no $id, name, properties
    rc = main(["--schema", str(bad), "--input", "x", "--violations", "v",
               "--manifest", "m"])
    assert rc == 2


GOOD_SCHEMA = {
    "$schema": "https://json-structure.org/meta/extended/v0/#",
    "$id": "https://t.local/ok", "name": "Ok",
    "type": "object",
    "properties": {"s": {"type": "string"}},
}


def test_cli_check_only_formats(tmp_path, capsys):
    """--check-only runs the front-end without Spark; --format selects
    text/json/tap reports (reference: rust/CLI.md:70-145)."""
    from sdk_spark.cli import main

    good = tmp_path / "ok.struct.json"
    good.write_text(json.dumps(GOOD_SCHEMA))
    assert main(["--schema", str(good), "--check-only",
                 "--format", "json"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep == {"valid": True, "issues": []}

    bad = tmp_path / "bad.struct.json"
    bad.write_text('{\n  "type": "object"\n}\n')
    assert main(["--schema", str(bad), "--check-only",
                 "--format", "json"]) == 2
    rep = json.loads(capsys.readouterr().err.strip())
    assert rep["valid"] is False and rep["issues"]
    assert all(i["line"] for i in rep["issues"])  # source-located

    assert main(["--schema", str(bad), "--check-only",
                 "--format", "tap"]) == 2
    err = capsys.readouterr().err
    assert "TAP version 14" in err and "not ok 1 -" in err

    # quiet: exit code only
    assert main(["--schema", str(bad), "--check-only", "--quiet"]) == 2
    assert capsys.readouterr().err == ""


def test_cli_stdin_schema(capsys, monkeypatch):
    import io

    from sdk_spark.cli import main

    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(GOOD_SCHEMA)))
    assert main(["--schema", "-", "--check-only"]) == 0


def test_cli_importmap(tmp_path, capsys):
    """--importmap URI=FILE feeds $import resolution
    (CompiledSchema external_schemas)."""
    from sdk_spark.cli import main

    bundle = tmp_path / "types.json"
    bundle.write_text(json.dumps({
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/types", "name": "Types",
        "definitions": {"Name": {"type": "string", "name": "Name"}},
    }))
    root = tmp_path / "root.struct.json"
    root.write_text(json.dumps({
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/root", "name": "Root",
        "$importdefs": "https://t.local/types",
        "type": "object",
        "properties": {"n": {"type": {"$ref": "#/definitions/Name"}}},
    }))
    # check-only path: schema front-end accepts the import-bearing root
    rc = main(["--schema", str(root), "--check-only",
               "--importmap", f"https://t.local/types={bundle}"])
    assert rc == 0
    # malformed map spec is a usage error
    rc = main(["--schema", str(root), "--check-only", "--importmap", "nope"])
    assert rc == 2


def test_cli_importmap_end_to_end(spark, tmp_path, capsys):
    """Full Spark run with an imported definition resolved via --importmap."""
    from sdk_spark.cli import main

    bundle = tmp_path / "types.json"
    bundle.write_text(json.dumps({
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/types", "name": "Types",
        "definitions": {"Code": {"type": "string", "name": "Code"}},
    }))
    root = tmp_path / "root.struct.json"
    root.write_text(json.dumps({
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/root", "name": "Root",
        "$importdefs": "https://t.local/types",
        "type": "object",
        # enum sits on the ref-bearing node: type:{$ref} copies structure
        # only (reference parity), local constraints still apply
        "properties": {"rid": {"type": "int32"},
                       "code": {"type": {"$ref": "#/definitions/Code"},
                                "enum": ["a", "b"]}},
    }))
    src = str(tmp_path / "rows")
    spark.createDataFrame([(1, "a"), (2, "zz")], "rid long, code string") \
        .write.parquet(src)
    rc = main(["--schema", str(root), "--input", src,
               "--violations", str(tmp_path / "viol"),
               "--manifest", str(tmp_path / "manifest"),
               "--unique-key", "rid",
               "--importmap", f"https://t.local/types={bundle}"])
    assert rc == 0
    viol = spark.read.parquet(str(tmp_path / "viol")).collect()
    assert {r["constraint_id"] for r in viol} == {"INSTANCE_ENUM_MISMATCH"}
