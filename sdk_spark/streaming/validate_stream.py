"""Structured Streaming validation (engine extension; reference has none).

The compiled constraint plan is a stateless projection, so it applies to a
streaming DataFrame unchanged — ``readStream → plan.validate → writeStream``.
Windowed verdicts use event-time windows + watermarks so late rows fold into
the right verdict window instead of being dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.core import CompiledSchema


def validate_stream(stream_df: DataFrame, schema_doc: dict,
                    extended: bool = True) -> DataFrame:
    """Apply the compiled plan to a streaming DataFrame (adds violations +
    valid columns; fully incremental, no state)."""
    plan = CompiledSchema(schema_doc, extended=extended)
    return plan.validate(stream_df)


def streaming_violations(stream_df: DataFrame, schema_doc: dict,
                         key_cols: list[str]) -> DataFrame:
    validated = validate_stream(stream_df, schema_doc)
    v = F.explode("violations").alias("v")
    return (validated.where(F.col("violation_count") > 0)
            .select(*key_cols, v)
            .where(F.col("v").isNotNull())
            .select(*key_cols,
                    F.col("v.constraint_id").alias("constraint_id"),
                    F.col("v.path").alias("path"),
                    F.col("v.value").alias("value")))


def windowed_verdicts(stream_df: DataFrame, schema_doc: dict,
                      event_time_col: str, window: str = "1 minute",
                      watermark: str = "5 minutes") -> DataFrame:
    """Per-event-time-window pass/fail verdicts with late-data tolerance."""
    validated = validate_stream(stream_df, schema_doc)
    return (validated
            .withWatermark(event_time_col, watermark)
            .groupBy(F.window(event_time_col, window).alias("window"))
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum(F.col("valid").cast("long")).alias("valid_rows"),
                 F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
                 F.sum(F.col("violation_count").cast("long"))
                 .alias("violation_count"))
            .withColumn("passed", F.col("invalid_rows") == F.lit(0)))
