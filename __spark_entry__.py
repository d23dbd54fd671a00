"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one engine operator from SURVEY.md §2 on
the driver's TPC-H-ish parquet tables; ``oracle_sql()`` gives the DuckDB
equivalent (FIXTURES.md §F3 mapping).  Column names are aliased identically
on both sides (the driver's compare is order-insensitive but name-sensitive).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sdk_spark.compiler.core import (  # noqa: E402
    CompiledSchema,
    violation_rows,
)
from sdk_spark.operators import table_checks as tc  # noqa: E402

META = "https://json-structure.org/meta/extended/v0/#"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _lineitem_schema() -> dict:
    """Range + multipleOf constraints over lineitem (engine §2.2 keywords)."""
    return {
        "$schema": META, "$id": "https://sdk-spark.local/lineitem", "name": "Lineitem",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {
            "l_quantity": {"type": "double", "minimum": 1, "maximum": 45},
            "l_discount": {"type": "double", "minimum": 0, "maximum": 0.1},
        },
        "required": ["l_quantity"],
    }


# --------------------------------------------------------------------------
# queries


def q_range_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum/maximum lowering → violation rows (SURVEY §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    schema = {
        "$schema": META, "$id": "https://sdk-spark.local/li-range", "name": "LiRange",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"l_quantity": {"type": "double", "minimum": 1, "maximum": 45}},
    }
    validated = CompiledSchema(schema, extended=True).validate(li)
    return (violation_rows(validated, ["l_orderkey", "l_linenumber"])
            .select("l_orderkey", "l_linenumber", "constraint_id", "path"))


def q_enum_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """enum membership lowering (SURVEY §2.1)."""
    orders = _t(spark, sf_dir, "orders")
    schema = {
        "$schema": META, "$id": "https://sdk-spark.local/ord-enum", "name": "OrdEnum",
        "type": "object",
        "properties": {"o_orderstatus": {"type": "string", "enum": ["O", "F"]}},
    }
    validated = CompiledSchema(schema, extended=True).validate(orders)
    return (violation_rows(validated, ["o_orderkey"])
            .select("o_orderkey", "constraint_id", "value"))


def q_pattern_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pattern (unanchored rlike) lowering (SURVEY §2.3)."""
    part = _t(spark, sf_dir, "part")
    schema = {
        "$schema": META, "$id": "https://sdk-spark.local/part-pat", "name": "PartPat",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"p_name": {"type": "string", "pattern": "^(red|blue|green) "}},
    }
    validated = CompiledSchema(schema, extended=True).validate(part)
    return (violation_rows(validated, ["p_partkey"])
            .select("p_partkey", "constraint_id", "value"))


def q_length_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minLength/maxLength lowering (SURVEY §2.3)."""
    part = _t(spark, sf_dir, "part")
    schema = {
        "$schema": META, "$id": "https://sdk-spark.local/part-len", "name": "PartLen",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"p_name": {"type": "string", "minLength": 9, "maxLength": 11}},
    }
    validated = CompiledSchema(schema, extended=True).validate(part)
    return (violation_rows(validated, ["p_partkey"])
            .select("p_partkey", "constraint_id", "value"))


def q_multipleof_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multipleOf with 1e-10 quotient tolerance (SURVEY §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    schema = {
        "$schema": META, "$id": "https://sdk-spark.local/li-mult", "name": "LiMult",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"l_quantity": {"type": "double", "multipleOf": 5}},
    }
    validated = CompiledSchema(schema, extended=True).validate(li)
    return (violation_rows(validated, ["l_orderkey", "l_linenumber"])
            .select("l_orderkey", "l_linenumber", "constraint_id"))


def q_unique_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table-level uniqueness: two-phase salted aggregation (SURVEY §2.8)."""
    li = _t(spark, sf_dir, "lineitem")
    return (tc.duplicate_keys(li, ["l_orderkey", "l_linenumber"])
            .select("l_orderkey", "l_linenumber", "cnt"))


def q_unique_violation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row-level duplicate-key violations via broadcast-back join."""
    li = _t(spark, sf_dir, "lineitem")
    return (tc.unique_violations(li, ["l_orderkey", "l_linenumber"])
            .select("l_orderkey", "l_linenumber", "constraint_id", "multiplicity"))


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """referential integrity via broadcast left-anti join (SURVEY §2.8)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (tc.fk_violations(orders, ["o_custkey"], customer, ["c_custkey"],
                             key_cols=["o_orderkey"])
            .select("o_orderkey", "constraint_id"))


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one-pass per-column stats (count/nulls/min/max) (SURVEY §2.8)."""
    li = _t(spark, sf_dir, "lineitem")
    prof = tc.column_profile(li, ["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_linenumber"])
    return prof.select("column", "rows", "nulls",
                       F.col("min").cast("long").alias("min_val"),
                       F.col("max").cast("long").alias("max_val"))


def q_verdict_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouped pass/fail verdicts (per-partition verdict analogue keyed on a
    real column so the oracle can reproduce it)."""
    li = _t(spark, sf_dir, "lineitem")
    validated = CompiledSchema(_lineitem_schema(), extended=True).validate(li)
    return (validated.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"))
            .withColumn("passed", F.col("invalid_rows") == 0))


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct (no SQL oracle: approximate by design; driver
    records the weaker rows-only check)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("orderkeys"),
        F.approx_count_distinct("l_partkey").alias("partkeys"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "range_check": q_range_check,
        "enum_check": q_enum_check,
        "pattern_check": q_pattern_check,
        "length_check": q_length_check,
        "multipleof_check": q_multipleof_check,
        "unique_keys": q_unique_keys,
        "unique_violation_rows": q_unique_violation_rows,
        "fk_orphans": q_fk_orphans,
        "column_stats": q_column_stats,
        "verdict_by_flag": q_verdict_by_flag,
        "distinct_counts": q_distinct_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "range_check": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_quantity < 1 THEN 'INSTANCE_NUMBER_MINIMUM'
                        ELSE 'INSTANCE_NUMBER_MAXIMUM' END AS constraint_id,
                   '#/l_quantity' AS path
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND NOT (l_quantity BETWEEN 1 AND 45)
        """,
        "enum_check": """
            SELECT o_orderkey, 'INSTANCE_ENUM_MISMATCH' AS constraint_id,
                   o_orderstatus AS value
            FROM orders
            WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
        """,
        "pattern_check": """
            SELECT p_partkey, 'INSTANCE_STRING_PATTERN_MISMATCH' AS constraint_id,
                   p_name AS value
            FROM part
            WHERE p_name IS NOT NULL
              AND NOT regexp_matches(p_name, '^(red|blue|green) ')
        """,
        "length_check": """
            SELECT p_partkey,
                   CASE WHEN length(p_name) < 9 THEN 'INSTANCE_STRING_MIN_LENGTH'
                        ELSE 'INSTANCE_STRING_MAX_LENGTH' END AS constraint_id,
                   p_name AS value
            FROM part
            WHERE p_name IS NOT NULL AND length(p_name) NOT BETWEEN 9 AND 11
        """,
        "multipleof_check": """
            SELECT l_orderkey, l_linenumber,
                   'INSTANCE_NUMBER_MULTIPLE_OF' AS constraint_id
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND abs(l_quantity/5.0 - round(l_quantity/5.0, 0)) > 1e-10
        """,
        "unique_keys": """
            SELECT l_orderkey, l_linenumber, count(*) AS cnt
            FROM lineitem
            GROUP BY l_orderkey, l_linenumber
            HAVING count(*) > 1
        """,
        "unique_violation_rows": """
            SELECT l_orderkey, l_linenumber,
                   'ENGINE_UNIQUE_VIOLATION' AS constraint_id,
                   cnt AS multiplicity
            FROM (SELECT l_orderkey, l_linenumber,
                         count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS cnt
                  FROM lineitem)
            WHERE cnt > 1
        """,
        "fk_orphans": """
            SELECT o_orderkey, 'ENGINE_FK_ORPHAN' AS constraint_id
            FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL)
        """,
        "column_stats": """
            SELECT 'l_orderkey' AS column, count(*) AS rows,
                   count(*) - count(l_orderkey) AS nulls,
                   min(l_orderkey) AS min_val, max(l_orderkey) AS max_val
            FROM lineitem
            UNION ALL
            SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
                   min(l_partkey), max(l_partkey) FROM lineitem
            UNION ALL
            SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
                   min(l_suppkey), max(l_suppkey) FROM lineitem
            UNION ALL
            SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
                   min(l_linenumber), max(l_linenumber) FROM lineitem
        """,
        "verdict_by_flag": """
            SELECT l_returnflag,
                   count(*) AS rows,
                   count(*) FILTER (
                       l_quantity IS NULL
                       OR NOT (l_quantity BETWEEN 1 AND 45)
                       OR (l_discount IS NOT NULL
                           AND NOT (l_discount BETWEEN 0 AND 0.1))
                   ) AS invalid_rows,
                   count(*) FILTER (
                       l_quantity IS NULL
                       OR NOT (l_quantity BETWEEN 1 AND 45)
                       OR (l_discount IS NOT NULL
                           AND NOT (l_discount BETWEEN 0 AND 0.1))
                   ) = 0 AS passed
            FROM lineitem
            GROUP BY l_returnflag
        """,
        # distinct_counts: intentionally no oracle (HLL is approximate)
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the lineitem constraint schema, validate sf0.001,
    return grouped verdicts (rows > 0, stable schema)."""
    return q_verdict_by_flag(spark, "/root/testdata/sf0.001")
