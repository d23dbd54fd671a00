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
