"""Structured Streaming validation (engine extension; reference has none).

The compiled constraint plan is a stateless projection, so it applies to a
streaming DataFrame unchanged — ``readStream → plan.validate → writeStream``.
Windowed verdicts use event-time windows + watermarks so late rows fold into
the right verdict window instead of being dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.core import CompiledSchema, verdict_aggs, violation_rows


def validate_stream(stream_df: DataFrame, schema_doc: dict,
                    extended: bool = True) -> DataFrame:
    """Apply the compiled plan to a streaming DataFrame (adds violations +
    valid columns; fully incremental, no state)."""
    plan = CompiledSchema(schema_doc, extended=extended)
    return plan.validate(stream_df)


def streaming_violations(stream_df: DataFrame, schema_doc: dict,
                         key_cols: list[str],
                         extended: bool = True) -> DataFrame:
    """The batch ``violation_rows`` shape over a stream — delegated to it,
    so the explode-then-filter plan (and its no-pre-filter rule: a
    ``violation_count > 0`` filter would re-evaluate the whole constraint
    plan in the Filter condition) stays defined in exactly one place."""
    return violation_rows(
        validate_stream(stream_df, schema_doc, extended=extended), key_cols)


def windowed_verdicts(stream_df: DataFrame, schema_doc: dict,
                      event_time_col: str, window: str = "1 minute",
                      watermark: str = "5 minutes",
                      extended: bool = True) -> DataFrame:
    """Per-event-time-window pass/fail verdicts with late-data tolerance."""
    validated = validate_stream(stream_df, schema_doc, extended=extended)
    return (validated
            .withWatermark(event_time_col, watermark)
            .groupBy(F.window(event_time_col, window).alias("window"))
            .agg(*verdict_aggs())
            .withColumn("passed", F.col("invalid_rows") == F.lit(0)))
