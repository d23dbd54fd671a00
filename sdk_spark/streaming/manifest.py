"""Per-partition checkpoint/resume with a lineage + metrics manifest table.

North-rule requirement: a killed validation job must resume without
recomputing validated partitions.  The reference has no execution state at
all (SURVEY.md §2.10) — this is a *batch idempotency* design, not
Structured Streaming:

1. read the manifest table → set of committed partition values;
2. validate only uncommitted partitions (predicate pushdown prunes the
   scan to each partition's files);
3. per partition: overwrite that partition's violation output
   (dynamic partition overwrite → idempotent re-runs), then append the
   manifest row LAST — the manifest append is the commit point.

A crash between (3a) and (3b) leaves an uncommitted partition whose output
is simply overwritten on retry.  On Iceberg the same protocol applies with
snapshot-append semantics; here it runs on plain parquet directories.
"""

from __future__ import annotations

import json
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType([
    T.StructField("partition_value", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("rows", T.LongType(), True),
    T.StructField("valid_rows", T.LongType(), True),
    T.StructField("invalid_rows", T.LongType(), True),
    T.StructField("violation_count", T.LongType(), True),
    T.StructField("run_id", T.StringType(), True),
    T.StructField("input_path", T.StringType(), True),
    T.StructField("schema_fingerprint", T.StringType(), True),
    T.StructField("started_at", T.DoubleType(), True),
    T.StructField("finished_at", T.DoubleType(), True),
])


def schema_fingerprint(schema_doc: dict) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(schema_doc, sort_keys=True).encode()).hexdigest()[:16]


def committed_partitions(spark: SparkSession, manifest_path: str,
                         fingerprint: str | None = None,
                         input_path: str | None = None) -> set[str]:
    """Partitions already validated — scoped to the current schema
    fingerprint (and optionally input path) so a resume after a schema or
    input change re-validates instead of silently skipping partitions
    committed under the old schema."""
    try:
        m = spark.read.parquet(manifest_path)
    except Exception:
        return set()
    cond = F.col("status") == "committed"
    if fingerprint is not None:
        cond = cond & (F.col("schema_fingerprint") == F.lit(fingerprint))
    if input_path is not None:
        cond = cond & (F.col("input_path") == F.lit(input_path))
    rows = m.where(cond).select("partition_value").distinct().collect()
    return {r[0] for r in rows}


@dataclass
class ResumableRun:
    run_id: str
    processed: list[str]
    skipped: list[str]


def run_resumable(
    spark: SparkSession,
    input_df: DataFrame,
    partition_col: str,
    manifest_path: str,
    violations_path: str,
    validate_fn: Callable[[DataFrame], tuple[DataFrame, dict]],
    schema_doc: dict | None = None,
    input_path: str = "",
    max_partitions: int | None = None,
) -> ResumableRun:
    """Validate partition-by-partition with resume.

    ``validate_fn(partition_df) -> (violations_df, metrics_dict)`` where
    metrics has rows/valid_rows/invalid_rows/violation_count.

    Cardinality assumption: ``partition_col`` is a COARSE partition key
    (dates/buckets — hundreds to low thousands of values, the Iceberg
    partition-spec grain), so collecting the distinct values and looping
    sequentially is a driver-side metadata operation, and each iteration's
    scan is pruned to that partition's files. Partition-keying on a
    high-cardinality column would turn this into millions of tiny jobs —
    checkpoint at the partition-spec grain, not the row grain.
    """
    run_id = str(uuid.uuid4())
    fp = schema_fingerprint(schema_doc) if schema_doc else ""
    done = committed_partitions(spark, manifest_path, fingerprint=fp)
    all_parts = [r[0] for r in (input_df.select(partition_col)
                                .distinct().orderBy(partition_col).collect())]
    todo = [p for p in all_parts if str(p) not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    processed: list[str] = []
    for part in todo:
        t0 = time.time()
        pdf = input_df.where(F.col(partition_col) == F.lit(part))
        violations, metrics = validate_fn(pdf)
        (violations
         .withColumn(partition_col, F.lit(part))
         .write.mode("overwrite")
         .partitionBy(partition_col)
         .parquet(violations_path))
        row = [(str(part), "committed",
                int(metrics.get("rows", 0)),
                int(metrics.get("valid_rows", 0)),
                int(metrics.get("invalid_rows", 0)),
                int(metrics.get("violation_count", 0)),
                run_id, input_path, fp, t0, time.time())]
        spark.createDataFrame(row, MANIFEST_SCHEMA) \
            .write.mode("append").parquet(manifest_path)
        processed.append(str(part))

    return ResumableRun(run_id=run_id, processed=processed,
                        skipped=[str(p) for p in all_parts if str(p) in done])


def validate_partition_metrics(validated: DataFrame) -> dict:
    """One-pass metrics over a validated partition (rows/valid/violations)."""
    row = validated.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("valid").cast("long")).alias("valid_rows"),
        F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
        F.sum(F.col("violation_count").cast("long")).alias("violation_count"),
    ).collect()[0]
    return {k: row[k] or 0 for k in
            ("rows", "valid_rows", "invalid_rows", "violation_count")}
