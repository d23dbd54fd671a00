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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Exact integer epoch-microseconds, independent of the session
    timezone.

    TIMESTAMP (with local tz) carries an instant: ``unix_micros`` is
    already tz-free.  TIMESTAMP_NTZ carries a wall clock: casting it to
    TIMESTAMP would reinterpret the wall in ``spark.sql.session.timeZone``
    and shift every epoch (and flip gap decisions across DST changes), so
    the wall clock is converted arithmetically — days since epoch +
    hour/minute + decimal seconds — touching no timezone at all.  This
    matches DuckDB's ``epoch_us`` on the same parquet column, which is
    also wall-based.
    """
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) != "timestamp_ntz":
        return F.unix_micros(c)
    days = F.datediff(c.cast("date"),
                      F.to_date(F.lit("1970-01-01"))).cast("long")
    whole = (days * 86400 + F.hour(c).cast("long") * 3600
             + F.minute(c).cast("long") * 60)
    secs = F.expr(f"extract(SECOND FROM `{ts_col}`)")   # decimal(8,6)
    return whole * F.lit(1_000_000) \
        + (secs * F.lit(1_000_000)).cast("long")


def sessionize(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               tiebreak_col: str | None = "event_id") -> DataFrame:
    """Add ``session_id`` (0-based per key, in time order) to every event.

    ``tiebreak_col`` breaks equal-timestamp ordering deterministically;
    it is used only when present in the frame (pass None to order by
    time alone — only safe if timestamps are unique per key).
    """
    order = [F.col(ts_col)]
    if tiebreak_col and tiebreak_col in df.columns:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    us = epoch_micros(df, ts_col)
    prev = F.lag(us).over(w)
    gap_us = int(gap_minutes * 60_000_000)
    is_new = (prev.isNull() | (us - prev > F.lit(gap_us))).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.lit(1))


def session_stats(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0,
                  tiebreak_col: str | None = "event_id") -> DataFrame:
    """(key, session_id, n_events, started_us, ended_us, duration_us)."""
    s = sessionize(df, key_col, ts_col, gap_minutes, tiebreak_col)
    return (s.groupBy(key_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(epoch_micros(s, ts_col)).alias("started_us"),
                 F.max(epoch_micros(s, ts_col)).alias("ended_us"))
            .withColumn("duration_us",
                        F.col("ended_us") - F.col("started_us")))
