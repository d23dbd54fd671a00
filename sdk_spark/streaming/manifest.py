"""Per-partition checkpoint/resume with a lineage + metrics manifest table.

North-rule requirement: a killed validation job must resume without
recomputing validated partitions.  The reference has no execution state at
all (SURVEY.md §2.10) — this is a *batch idempotency* design, not
Structured Streaming:

1. read the manifest table → set of committed partition values;
2. validate only uncommitted partitions (predicate pushdown prunes the
   scan to each partition's files);
3. per partition: statically overwrite that partition's hive-style
   violation directory (``col=value`` — idempotent re-runs, and an EMPTY
   result clears stale rows, which dynamic partition overwrite would
   not), then append the manifest row LAST — the manifest append is the
   commit point.

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
    from pyspark.errors import AnalysisException

    try:
        m = spark.read.parquet(manifest_path)
    except AnalysisException as exc:
        # ONLY the first-run case (no manifest yet) means "nothing
        # committed"; storage/permission/corruption errors must surface,
        # not silently trigger a full recompute of every partition
        if "PATH_NOT_FOUND" in str(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc):
            return set()
        raise
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

    ``validate_fn(partition_df) -> (violations_df, metrics)`` where metrics
    is either a dict with rows/valid_rows/invalid_rows/violation_count or a
    zero-arg callable returning one — pass ``observe_metrics``'s thunk to
    collect the metrics during the violations write (single scan).

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
    # Scope the committed set by input path too (when one was given): a
    # resume pointed at a DIFFERENT input must re-validate overlapping
    # partition values, not silently skip them as already done.
    done = committed_partitions(spark, manifest_path, fingerprint=fp,
                                input_path=input_path or None)
    all_parts = [r[0] for r in (input_df.select(partition_col)
                                .distinct().orderBy(partition_col).collect())]
    todo = [p for p in all_parts if str(p) not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]

    processed: list[str] = []
    for part in todo:
        t0 = time.time()
        # eqNullSafe: a NULL partition value must select its rows — a plain
        # equality filter matches nothing, silently committing the NULL
        # partition as validated with zero rows
        pdf = input_df.where(F.col(partition_col).eqNullSafe(F.lit(part)))
        violations, metrics = validate_fn(pdf)
        # Static overwrite of THIS partition's directory (hive-style
        # `col=value` layout, so readers of violations_path see a normal
        # partitioned table).  Dynamic partition overwrite is wrong here:
        # an EMPTY violations result overwrites nothing under dynamic mode,
        # leaving stale rows from a prior run in place — and flipping the
        # session-global partitionOverwriteMode leaked semantics into the
        # caller's later writes.
        part_dir = f"{violations_path}/{partition_col}={_escape_part(part)}"
        violations.drop(partition_col).write.mode("overwrite").parquet(part_dir)
        if callable(metrics):
            # Observation-style metrics (see ``observe_metrics``): collected
            # as a side effect of the violations write — ONE pass over the
            # partition instead of a metrics action plus a write action.
            metrics = metrics()
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


_METRIC_KEYS = ("rows", "valid_rows", "invalid_rows", "violation_count")

# the characters Spark's ExternalCatalogUtils.escapePathName rewrites, so
# readers of the hive-style directory layout unescape values identically
_HIVE_UNSAFE = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_part(value) -> str:
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return "".join("%{:02X}".format(ord(ch))
                   if ch in _HIVE_UNSAFE or ord(ch) < 32 else ch
                   for ch in str(value))


def validate_partition_metrics(validated: DataFrame) -> dict:
    """Metrics over a validated partition as a STANDALONE action (one extra
    scan).  Inside ``run_resumable`` prefer ``observe_metrics``, which
    collects the same numbers as a side effect of the violations write."""
    from ..compiler.core import verdict_aggs

    row = validated.agg(*verdict_aggs()).collect()[0]
    return {k: row[k] or 0 for k in _METRIC_KEYS}


def observe_metrics(validated: DataFrame
                    ) -> tuple[DataFrame, Callable[[], dict]]:
    """Single-pass metrics: attach an ``Observation`` to the validated plan
    and return ``(observed_df, thunk)``.  Build the violations from
    ``observed_df``; after the violations write has run, the thunk returns
    the same rows/valid/invalid/violation_count dict that
    ``validate_partition_metrics`` computes — without a second scan.
    ``run_resumable`` accepts the thunk directly as ``metrics``."""
    from pyspark.sql import Observation

    from ..compiler.core import verdict_aggs

    obs = Observation()
    observed = validated.observe(obs, *verdict_aggs())

    def get() -> dict:
        row = obs.get
        return {k: int(row[k] or 0) for k in _METRIC_KEYS}

    return observed, get
