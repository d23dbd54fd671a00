"""spark-submit entry point (north-rule packaging requirement).

Usage::

    spark-submit --py-files sdk_spark.zip validate_job.py \
        --schema images.struct.json \
        --input  /data/images_parquet_or_iceberg_table \
        --partition-col date \
        --violations /out/violations \
        --manifest   /out/manifest \
        [--check-pixels] [--unique-key image_id] [--resume] \
        [--importmap URI=FILE ...] [--format text|json|tap]

Reads the input (parquet path or ``table:<name>`` for a catalog/Iceberg
table), compiles the JSON Structure schema, validates partition-by-
partition with manifest checkpointing, and writes violation rows + metrics.

CLI parity with the reference ``jstruct`` tool (reference: rust/CLI.md:70-145):
``--schema -`` reads stdin, ``--importmap URI=FILE`` resolves ``$import``
targets (the bundle mechanism), ``--format text|json|tap`` selects the
schema-check report format, and ``--check-only`` runs the schema front-end
without starting Spark. Schema errors carry (line, col) source locations
via ``sdk_spark.schema.locator``.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdk-spark-validate")
    p.add_argument("--schema", default=None,
                   help="JSON Structure schema file, or '-' for stdin "
                        "(required unless --infer)")
    p.add_argument("--infer", action="store_true",
                   help="profile --input and print a DRAFT JSON Structure "
                        "schema (types + required + margin-widened bounds "
                        "+ enums) instead of validating; the output is the "
                        "authoring-loop starting point for --schema")
    p.add_argument("--infer-margin", type=float, default=0.1,
                   help="relative widening applied to observed bounds")
    p.add_argument("--infer-enum-limit", type=int, default=16)
    p.add_argument("--sample-fraction", type=float, default=None,
                   help="profile a seeded sample instead of the full table")
    p.add_argument("--input", default=None,
                   help="parquet path or table:<catalog table name>")
    p.add_argument("--violations", default=None, help="violations output path")
    p.add_argument("--manifest", default=None, help="manifest table path")
    p.add_argument("--partition-col", default=None,
                   help="partition column for checkpoint/resume granularity")
    p.add_argument("--unique-key", action="append", default=[],
                   help="column(s) that must be table-unique")
    p.add_argument("--check-pixels", action="store_true",
                   help="enable the decoded-pixel/caption invariant kernel")
    p.add_argument("--psnr-threshold", type=float, default=40.0)
    p.add_argument("--extended", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="extended metaschema semantics (--no-extended for "
                        "the strict core profile)")
    p.add_argument("--max-partitions", type=int, default=None,
                   help="validate at most N uncommitted partitions (smoke runs)")
    p.add_argument("--importmap", action="append", default=[],
                   metavar="URI=FILE",
                   help="map an $import URI to a local schema file "
                        "(repeatable; jstruct --bundle equivalent)")
    p.add_argument("--format", choices=("text", "json", "tap"), default="text",
                   help="schema-check report format")
    p.add_argument("--check-only", action="store_true",
                   help="run the schema front-end check and exit (no Spark)")
    p.add_argument("--metaschema", action="store_true",
                   help="allow '$' in property-name identifiers (for "
                        "validating metaschemas; reference: "
                        "json-structure-check --metaschema, "
                        "schema_validator.py:1347-1348)")
    p.add_argument("--quiet", "-q", action="store_true",
                   help="suppress report output; exit code only")
    return p


def _read_schema(path: str) -> tuple[dict, str]:
    if path == "-":
        text = sys.stdin.read()
    else:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    return json.loads(text), text


def _load_importmap(specs: list[str]) -> list[dict]:
    out = []
    for spec in specs:
        uri, _, fname = spec.partition("=")
        if not fname:
            raise ValueError(f"--importmap expects URI=FILE, got {spec!r}")
        with open(fname, encoding="utf-8") as f:
            doc = json.load(f)
        doc.setdefault("$id", uri)
        if doc["$id"] != uri:
            # the map key wins: callers address the bundle by this URI
            doc = {**doc, "$id": uri}
        out.append(doc)
    return out


def emit_report(located: list[dict], fmt: str, quiet: bool,
                out=None) -> None:
    """Render schema-check issues as text / json / TAP."""
    out = out or sys.stderr
    if quiet:
        return
    if fmt == "json":
        print(json.dumps({"valid": not located, "issues": located}), file=out)
        return
    if fmt == "tap":
        print("TAP version 14", file=out)
        if not located:
            print("1..1", file=out)
            print("ok 1 - schema valid", file=out)
            return
        print(f"1..{len(located)}", file=out)
        for i, issue in enumerate(located, 1):
            where = (f" at line {issue['line']}, col {issue['col']}"
                     if issue.get("line") else "")
            print(f"not ok {i} - {issue['code']} {issue['path']}{where}",
                  file=out)
        return
    for issue in located:
        where = (f" (line {issue['line']}, col {issue['col']})"
                 if issue.get("line") else "")
        print(f"SCHEMA ERROR: [{issue['code']}] {issue['message']} "
              f"at {issue['path']}{where}", file=out)


def _read_input(spark, input_arg: str):
    """parquet path or ``table:<name>`` — delegated to the sources reader
    so the CLI and library cannot drift on scheme handling."""
    from .sources.readers import read_table

    return read_table(spark, input_arg)


def _run_infer(args) -> int:
    if args.schema or args.check_only:
        print("ERROR: --infer conflicts with --schema/--check-only "
              "(it PRODUCES the schema)", file=sys.stderr)
        return 2
    if not args.input:
        print("ERROR: --infer requires --input", file=sys.stderr)
        return 2
    from pyspark.sql import SparkSession

    from .schema.infer import infer_schema

    spark = SparkSession.builder.getOrCreate()
    df = _read_input(spark, args.input)
    doc = infer_schema(df, margin=args.infer_margin,
                       enum_limit=args.infer_enum_limit,
                       sample_fraction=args.sample_fraction)
    print(json.dumps(doc, indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)

    if args.infer:
        return _run_infer(args)
    if not args.schema:
        print("ERROR: --schema is required unless --infer", file=sys.stderr)
        return 2

    from .schema.locator import locate_issues
    from .schema.validator import SchemaChecker

    try:
        schema_doc, schema_text = _read_schema(args.schema)
    except FileNotFoundError:
        print(f"SCHEMA ERROR: file not found: {args.schema}", file=sys.stderr)
        return 2
    except json.JSONDecodeError as ex:
        print(f"SCHEMA ERROR: invalid JSON in {args.schema}: {ex}",
              file=sys.stderr)
        return 2

    try:
        external = _load_importmap(args.importmap)
    except (ValueError, FileNotFoundError, json.JSONDecodeError) as ex:
        print(f"IMPORTMAP ERROR: {ex}", file=sys.stderr)
        return 2

    checked_doc = schema_doc
    if external:
        # resolve $import/$importdefs against the map BEFORE the front-end
        # check, exactly as compilation will (CompiledSchema merges the same
        # bundles); issue paths that land in merged-in definitions resolve
        # to their nearest enclosing node in the source text
        from .schema.normalize import import_defs

        checked_doc = import_defs(schema_doc, {d["$id"]: d for d in external})
    front_errors = SchemaChecker(
        extended=args.extended,
        allow_dollar=args.metaschema).validate(checked_doc)
    located = locate_issues(schema_text, front_errors)
    if front_errors:
        emit_report(located, args.format, args.quiet)
        return 2
    if args.check_only:
        emit_report([], args.format, args.quiet,
                    out=sys.stdout)
        return 0
    if not (args.input and args.violations and args.manifest):
        print("ERROR: --input/--violations/--manifest required unless "
              "--check-only", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from .compiler.core import CompiledSchema, violation_rows
    from .operators import table_checks as tc
    from .streaming.manifest import observe_metrics, run_resumable

    spark = SparkSession.builder.appName("sdk-spark-validate").getOrCreate()
    df = _read_input(spark, args.input)

    plan = CompiledSchema(schema_doc, extended=args.extended,
                          external_schemas=external or None)

    key_col = (args.unique_key[0] if args.unique_key
               else ("image_id" if "image_id" in df.columns
                     else df.columns[0]))
    if args.check_pixels and key_col != "image_id":
        print("ERROR: --check-pixels keys its violations by image_id; "
              f"--unique-key {key_col} would make unionByName fail — "
              "use image_id as the (first) unique key", file=sys.stderr)
        return 2

    # --unique-key means TABLE-unique: with --partition-col, per-slice
    # checks would miss duplicates spanning two partitions, so the
    # duplicate-key set is computed ONCE over the full input, persisted,
    # and each partition's rows are matched against it.
    global_dups = None
    if args.unique_key and args.partition_col:
        from pyspark import StorageLevel
        from pyspark.sql import functions as F

        global_dups = (tc.duplicate_keys(df, args.unique_key)
                       .select(*[F.col(k).alias(f"__gk_{i}")
                                 for i, k in enumerate(args.unique_key)])
                       .persist(StorageLevel.MEMORY_AND_DISK))
        global_dups.count()  # ONE full-table pass; every partition reuses it

    def validate_fn(pdf):
        # metrics ride the violations write via Observation — one scan per
        # partition instead of a metrics action plus a write action
        validated, metrics = observe_metrics(plan.validate(pdf))
        viol = violation_rows(validated, [key_col])
        if args.unique_key:
            if global_dups is not None:
                from functools import reduce as _reduce

                from pyspark.sql import functions as F

                cond = _reduce(lambda a, b: a & b,
                               [pdf[k].eqNullSafe(global_dups[f"__gk_{i}"])
                                for i, k in enumerate(args.unique_key)])
                uv = (pdf.join(global_dups, cond, "inner")
                      .select(pdf[key_col].alias(key_col),
                              F.lit("ENGINE_UNIQUE_VIOLATION")
                              .alias("constraint_id"),
                              F.lit("#/" + ",".join(args.unique_key))
                              .alias("path"),
                              F.concat_ws("|", *[pdf[k].cast("string")
                                                 for k in args.unique_key])
                              .alias("value")))
            else:
                uv = tc.unique_violations(pdf, args.unique_key) \
                    .select(key_col, "constraint_id", "path", "value")
            viol = viol.unionByName(uv)
        if args.check_pixels:
            from .operators.multimodal import pixel_caption_invariants

            viol = viol.unionByName(
                pixel_caption_invariants(pdf, args.psnr_threshold)
                .select("image_id", "constraint_id", "path", "value"))
        return viol, metrics

    if args.partition_col:
        run = run_resumable(
            spark, df, args.partition_col, args.manifest, args.violations,
            validate_fn, schema_doc=schema_doc, input_path=args.input,
            max_partitions=args.max_partitions)
        if global_dups is not None:
            global_dups.unpersist(False)
        print(json.dumps({"run_id": run.run_id,
                          "processed": run.processed,
                          "skipped_committed": run.skipped}))
    else:
        viol, metrics = validate_fn(df)
        viol.write.mode("overwrite").parquet(args.violations)
        if callable(metrics):  # Observation thunk: resolves after the write
            metrics = metrics()
        spark.createDataFrame([json.dumps(metrics)], "string") \
            .write.mode("append").text(args.manifest + "_metrics")
        print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
