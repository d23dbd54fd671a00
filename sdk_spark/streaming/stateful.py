"""Custom stateful streaming operators (``applyInPandasWithState``).

The stateless compiled plan covers per-row validation; these operators add
the cross-batch state the task brief calls for:

* ``running_verdicts`` — per-key cumulative pass/fail across micro-batches:
  state = (rows, invalid_rows, violation_count) per key, updated with each
  batch's validated rows and emitted as a running verdict row.  This is the
  streaming analogue of ``partition_verdicts`` — a partition's verdict
  evolves as data keeps arriving instead of being a one-shot batch fact.
* ``first_seen`` — cross-batch exact dedup primitive: emits only the first
  occurrence of each key, with TTL-style state expiry via processing-time
  timeout so the state store is bounded (at 10^12-row scale unbounded
  per-key state is a guaranteed OOM; expired keys may re-emit, which is the
  standard at-least-once trade).

Both are Arrow-batched per group (pandas in/out) — no per-row Python at the
API layer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..compiler.core import CompiledSchema

RUNNING_VERDICT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), True),
    T.StructField("rows", T.LongType(), True),
    T.StructField("invalid_rows", T.LongType(), True),
    T.StructField("violation_count", T.LongType(), True),
    T.StructField("passed", T.BooleanType(), True),
])
_VERDICT_STATE = T.StructType([
    T.StructField("rows", T.LongType(), True),
    T.StructField("invalid_rows", T.LongType(), True),
    T.StructField("violation_count", T.LongType(), True),
])

FIRST_SEEN_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), True),
])
_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def running_verdicts(stream_df: DataFrame, schema_doc: dict, key_col: str,
                     extended: bool = True) -> DataFrame:
    """Per-key cumulative verdicts across micro-batches.

    The compiled plan runs FIRST (stateless projection, whole-stage
    codegen); the stateful step only folds tiny (valid, n_violations)
    pairs into per-key counters — state size is O(keys), not O(rows).
    """
    plan = CompiledSchema(schema_doc, extended=extended)
    validated = plan.validate(stream_df).select(
        F.col(key_col).cast("string").alias("key"),
        F.col("valid"),
        F.col("violation_count").alias("nv"))

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState
               ) -> Iterator[pd.DataFrame]:
        rows = invalid = viols = 0
        if state.exists:
            rows, invalid, viols = state.get
        for pdf in pdfs:
            rows += len(pdf)
            invalid += int((~pdf["valid"]).sum())
            viols += int(pdf["nv"].sum())
        state.update((rows, invalid, viols))
        yield pd.DataFrame([{
            "key": key[0], "rows": rows, "invalid_rows": invalid,
            "violation_count": viols, "passed": invalid == 0,
        }])

    return (validated.groupBy("key")
            .applyInPandasWithState(update, RUNNING_VERDICT_SCHEMA,
                                    _VERDICT_STATE, "update",
                                    GroupStateTimeout.NoTimeout))


def first_seen(stream_df: DataFrame, key_col: str,
               ttl_ms: int = 24 * 3600 * 1000) -> DataFrame:
    """Emit each key's FIRST occurrence only (cross-batch dedup).

    State is one boolean per live key with a processing-time TTL so the
    store stays bounded; a key recurring after expiry re-emits (documented
    at-least-once semantics — exact global dedup over unbounded time needs
    the batch ``exact_duplicates`` pass instead).
    """
    keyed = stream_df.select(F.col(key_col).cast("string").alias("key"))

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState
               ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        fresh = not state.exists
        state.update((True,))
        state.setTimeoutDuration(ttl_ms)
        # drain the iterator (rows themselves don't matter beyond arrival)
        for _ in pdfs:
            pass
        if fresh:
            yield pd.DataFrame([{"key": key[0]}])

    return (keyed.groupBy("key")
            .applyInPandasWithState(update, FIRST_SEEN_SCHEMA, _SEEN_STATE,
                                    "update",
                                    GroupStateTimeout.ProcessingTimeTimeout))


SESSION_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), True),
    T.StructField("session_start_us", T.LongType(), True),
    T.StructField("session_end_us", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
    T.StructField("closed", T.BooleanType(), True),
])
_SESSION_STATE = T.StructType([
    T.StructField("start_us", T.LongType(), True),
    T.StructField("end_us", T.LongType(), True),
    T.StructField("n", T.LongType(), True),
])


def streaming_sessions(stream_df: DataFrame, key_col: str,
                       ts_col: str = "ts",
                       gap_minutes: float = 30.0) -> DataFrame:
    """Streaming twin of ``operators.sessions.sessionize``: per-key gap
    sessions over a stream, closed by a processing-time timeout.

    Semantics per micro-batch (events sorted by time within the batch):
    an event within ``gap`` of the open session extends it; a larger gap
    CLOSES the open session (emitted with ``closed=true``) and opens a
    new one.  A processing-time timeout of the same gap closes idle
    sessions so state is O(active keys), never O(events) — the same
    bounded-state discipline as ``first_seen``.  Updates for the open
    session are emitted with ``closed=false`` so downstream sinks can
    show live session activity.

    Exactly the batch operator's boundary rule (gap STRICTLY greater
    than the threshold starts a new session, exact-microsecond compare),
    so a backfill with ``sessionize`` and the live stream agree on every
    boundary decision — PROVIDED each key's events arrive time-ordered
    across micro-batches.  Within a micro-batch events are sorted, and a
    late in-gap event arriving in a later batch extends the open
    session's start/end envelope (``min``/``max``), but an old event
    that should retroactively split, predate, or reopen an already-
    closed session cannot be replayed — that is inherent to single-pass
    streaming state; use the batch operator for exact backfills of
    out-of-order history.
    """
    gap_us = int(gap_minutes * 60_000_000)
    # epoch_micros, NOT unix_micros(cast('timestamp')): the cast would
    # reinterpret a TIMESTAMP_NTZ wall clock in the session timezone and
    # flip gap decisions across DST — the batch sessionize uses the same
    # helper, which is what makes the boundary-agreement guarantee hold.
    from ..operators.sessions import epoch_micros

    slim = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        epoch_micros(stream_df, ts_col).alias("us"))

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState
               ) -> Iterator[pd.DataFrame]:
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                out.append((key[0], s, e, n, True))
            state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in
                                             SESSION_SCHEMA.fields])
            return
        cur = state.get if state.exists else None
        times = []
        for pdf in pdfs:
            times.extend(int(v) for v in pdf["us"] if not pd.isna(v))
        times.sort()
        for us in times:
            if cur is None:
                cur = (us, us, 1)
            elif us - cur[1] > gap_us:
                out.append((key[0], cur[0], cur[1], cur[2], True))
                cur = (us, us, 1)
            else:
                # min() too: a late out-of-order event landing inside
                # the gap of the open session must widen its start, not
                # silently inherit a later session_start
                cur = (min(cur[0], us), max(cur[1], us), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(gap_us // 1000 or 1)
            out.append((key[0], cur[0], cur[1], cur[2], False))
        yield pd.DataFrame(out, columns=[f.name for f in
                                         SESSION_SCHEMA.fields])

    return (slim.groupBy("key")
            .applyInPandasWithState(update, SESSION_SCHEMA, _SESSION_STATE,
                                    "update",
                                    GroupStateTimeout.ProcessingTimeTimeout))
