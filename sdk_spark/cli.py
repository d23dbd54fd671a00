"""spark-submit entry point (north-rule packaging requirement).

Usage::

    spark-submit --py-files sdk_spark.zip validate_job.py \
        --schema images.struct.json \
        --input  /data/images_parquet_or_iceberg_table \
        --partition-col date \
        --violations /out/violations \
        --manifest   /out/manifest \
        [--check-pixels] [--unique-key image_id] [--resume]

Reads the input (parquet path or ``table:<name>`` for a catalog/Iceberg
table), compiles the JSON Structure schema, validates partition-by-
partition with manifest checkpointing, and writes violation rows + metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdk-spark-validate")
    p.add_argument("--schema", required=True, help="JSON Structure schema file")
    p.add_argument("--input", required=True,
                   help="parquet path or table:<catalog table name>")
    p.add_argument("--violations", required=True, help="violations output path")
    p.add_argument("--manifest", required=True, help="manifest table path")
    p.add_argument("--partition-col", default=None,
                   help="partition column for checkpoint/resume granularity")
    p.add_argument("--unique-key", action="append", default=[],
                   help="column(s) that must be table-unique")
    p.add_argument("--check-pixels", action="store_true",
                   help="enable the decoded-pixel/caption invariant kernel")
    p.add_argument("--psnr-threshold", type=float, default=40.0)
    p.add_argument("--extended", action="store_true", default=True)
    p.add_argument("--max-partitions", type=int, default=None,
                   help="validate at most N uncommitted partitions (smoke runs)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from .compiler.core import CompiledSchema, violation_rows
    from .operators import table_checks as tc
    from .schema.validator import SchemaChecker
    from .streaming.manifest import (
        run_resumable,
        validate_partition_metrics,
    )

    try:
        with open(args.schema, encoding="utf-8") as f:
            schema_doc = json.load(f)
    except FileNotFoundError:
        print(f"SCHEMA ERROR: file not found: {args.schema}", file=sys.stderr)
        return 2
    except json.JSONDecodeError as ex:
        print(f"SCHEMA ERROR: invalid JSON in {args.schema}: {ex}", file=sys.stderr)
        return 2

    front_errors = SchemaChecker(extended=args.extended).validate(schema_doc)
    if front_errors:
        for e in front_errors:
            print(f"SCHEMA ERROR: {e}", file=sys.stderr)
        return 2

    spark = SparkSession.builder.appName("sdk-spark-validate").getOrCreate()
    if args.input.startswith("table:"):
        df = spark.read.table(args.input.removeprefix("table:"))
    else:
        df = spark.read.parquet(args.input)

    plan = CompiledSchema(schema_doc, extended=args.extended)

    def validate_fn(pdf):
        validated = plan.validate(pdf)
        viol = violation_rows(validated, [args.unique_key[0]] if args.unique_key
                              else [df.columns[0]])
        if args.unique_key:
            viol = viol.unionByName(
                tc.unique_violations(pdf, args.unique_key)
                .select(*viol.columns[:1], "constraint_id", "path", "value"))
        if args.check_pixels:
            from .operators.multimodal import pixel_caption_invariants

            viol = viol.unionByName(
                pixel_caption_invariants(pdf, args.psnr_threshold)
                .select("image_id", "constraint_id", "path", "value"))
        return viol, validate_partition_metrics(validated)

    if args.partition_col:
        run = run_resumable(
            spark, df, args.partition_col, args.manifest, args.violations,
            validate_fn, schema_doc=schema_doc, input_path=args.input,
            max_partitions=args.max_partitions)
        print(json.dumps({"run_id": run.run_id,
                          "processed": run.processed,
                          "skipped_committed": run.skipped}))
    else:
        viol, metrics = validate_fn(df)
        viol.write.mode("overwrite").parquet(args.violations)
        spark.createDataFrame([json.dumps(metrics)], "string") \
            .write.mode("append").text(args.manifest + "_metrics")
        print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
