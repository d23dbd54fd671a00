"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_QUERIES       comma-separated subset to run (default: headline set)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

HEADLINE = [
    "validate_full",        # flagship: full constraint plan over lineitem
    "range_check",
    "multipleof_check",
    "unique_keys",
    "unique_violation_rows",
    "fk_orphans",
    "column_stats",
    "verdict_by_flag",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sdk_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # single-file local inputs: split scans so all cores participate
        # (irrelevant at 100 TB where file count >> cores, but needed for a
        # fair local[N] parallelism measurement)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", "-XX:ParallelGCThreads=8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def force(df) -> int:
    """Fully execute a plan without driver-side materialization."""
    return df.write.format("noop").mode("overwrite").save() or 0


def q_validate_full(spark, sf_dir):
    """Flagship: every lineitem constraint in one projection + verdicts."""
    import __spark_entry__ as e
    from sdk_spark.compiler.core import CompiledSchema, partition_verdicts

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = CompiledSchema(e._lineitem_schema(), extended=True)
    return partition_verdicts(plan.validate(li))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod

    wanted = os.environ.get("BENCH_QUERIES")
    names = wanted.split(",") if wanted else HEADLINE

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = dict(entrymod.queries())
    registry["validate_full"] = q_validate_full

    # warm the JVM + parquet footers once (excluded from timings)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    reps = int(os.environ.get("BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        fn = registry[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        total += best

    # throughput figure for the flagship validation pass
    n_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    rows_per_sec = n_rows / timings["validate_full"] if "validate_full" in timings else None

    print(json.dumps({
        "metric": "validation_suite_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "rows": n_rows,
        "validate_rows_per_sec": round(rows_per_sec) if rows_per_sec else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
