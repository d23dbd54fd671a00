"""Gap-based sessionization over an event stream (batch form).

The classic lag/cumsum formulation: within each key, a new session
starts whenever the gap to the previous event exceeds ``gap``; the
session id is the running count of session starts.  Pure window
functions — one shuffle on the key, whole-stage codegen, and an exact
ANSI-SQL twin (the driver oracles it against DuckDB verbatim).

100-TB shape: the two windows (lag + running sum) share the same
``partitionBy(key) orderBy(ts)`` spec, so Catalyst plans ONE exchange +
ONE sort and evaluates both frames in a single Window operator.  Skewed
keys (a bot user with millions of events) are bounded by the windows
being streaming-evaluable (no full-partition buffering for lag/sum).
The streaming twin of this operator is ``streaming/stateful.py``'s
``applyInPandasWithState`` running verdicts — this is the batch/backfill
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0) -> DataFrame:
    """Add ``session_id`` (0-based per key, in time order) to every event."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id") \
        if "event_id" in df.columns else \
        Window.partitionBy(key_col).orderBy(ts_col)
    # exact integer microseconds (DuckDB twin: epoch_us) — a float-epoch
    # comparison could flip on boundary gaps between engines.  Parquet
    # timestamps may load as TIMESTAMP_NTZ, which unix_micros rejects;
    # casting to TIMESTAMP first is a no-op for the instant itself.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    gap_us = int(gap_minutes * 60_000_000)
    is_new = (prev.isNull() | (us - prev > F.lit(gap_us))).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.lit(1))


def session_stats(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts",
                  gap_minutes: float = 30.0) -> DataFrame:
    """(key, session_id, n_events, started_us, ended_us, duration_us)."""
    s = sessionize(df, key_col, ts_col, gap_minutes)
    return (s.groupBy(key_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
                 .alias("started_us"),
                 F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                 .alias("ended_us"))
            .withColumn("duration_us",
                        F.col("ended_us") - F.col("started_us")))
