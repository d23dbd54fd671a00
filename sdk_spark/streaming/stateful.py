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
