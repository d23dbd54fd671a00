"""Source readers: typed tables and schema-applied semi-structured input.

The reference's only source is a JSON file per instance
(reference: python/src/json_structure/instance_validator.py:1295-1313); the
engine generalizes to Spark's batch sources.  Typed sources (parquet /
Iceberg tables) carry their own schema; semi-structured sources (JSON
lines, CSV) are loaded against the StructType derived from the compiled
JSON Structure schema, with corrupt records captured instead of dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.core import CompiledSchema
from .. import errors as E

CORRUPT_COL = "_corrupt_record"


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """``table:<name>`` → catalog/Iceberg table; otherwise a parquet path."""
    if source.startswith("table:"):
        return spark.read.table(source.removeprefix("table:"))
    return spark.read.parquet(source)


def read_json_typed(spark: SparkSession, path: str,
                    plan: CompiledSchema) -> DataFrame:
    """JSON-lines → typed DataFrame with the plan's expected schema.

    Unparseable lines land in ``_corrupt_record`` (PERMISSIVE mode) so the
    validator can emit violations for them instead of losing rows.
    """
    st = plan.struct_type()
    with_corrupt = T.StructType(
        list(st.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    return (spark.read
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(with_corrupt)
            .json(path))


def read_csv_typed(spark: SparkSession, path: str, plan: CompiledSchema,
                   header: bool = True) -> DataFrame:
    st = plan.struct_type()
    with_corrupt = T.StructType(
        list(st.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    return (spark.read
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(with_corrupt)
            .csv(path))


def corrupt_record_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Violation rows for records that failed structural parsing."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"DataFrame has no {CORRUPT_COL} column")
    return (df.where(F.col(CORRUPT_COL).isNotNull())
            .select(*key_cols,
                    F.lit(E.INSTANCE_TYPE_MISMATCH).alias("constraint_id"),
                    F.lit("#").alias("path"),
                    F.substring(F.col(CORRUPT_COL), 1, 256).alias("value")))


def validate_json_source(spark: SparkSession, path: str, schema_doc: dict,
                         key_cols: list[str], extended: bool = True) -> DataFrame:
    """One-call pipeline: read JSON lines → typed parse → compiled plan →
    violation rows (parse failures included)."""
    from ..compiler.core import violation_rows

    plan = CompiledSchema(schema_doc, extended=extended)
    df = read_json_typed(spark, path, plan)
    ok_rows = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    validated = plan.validate(ok_rows)
    return violation_rows(validated, key_cols).unionByName(
        corrupt_record_violations(df, key_cols))
