"""Gap-based sessionization vs a pure-Python reference walk."""

from __future__ import annotations

import datetime as dt

from sdk_spark.operators.sessions import session_stats, sessionize


def evts(spark, rows):
    return spark.createDataFrame(
        [(i, t, u) for i, (t, u) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long")


T0 = dt.datetime(2024, 1, 1)


def m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_sessionize_reference_walk(spark):
    rows = [(m(0), 1), (m(10), 1), (m(50), 1),    # gap 40 -> new session
            (m(55), 1), (m(200), 1),              # gap 145 -> new session
            (m(0), 2)]                            # other user
    got = {(r["user_id"], r["event_id"]): r["session_id"]
           for r in sessionize(evts(spark, rows), gap_minutes=30).collect()}
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 1,
                   (1, 3): 1, (1, 4): 2, (2, 5): 0}


def test_gap_boundary_is_exclusive(spark):
    """A gap of EXACTLY the threshold stays in the same session (> not >=),
    and one microsecond more splits — exact-integer comparison."""
    rows = [(m(0), 1), (m(30), 1),
            (m(30 + 30) , 1),
            (m(60 + 30) + dt.timedelta(microseconds=1), 1)]
    got = [r["session_id"] for r in
           sessionize(evts(spark, rows), gap_minutes=30)
           .orderBy("event_id").collect()]
    assert got == [0, 0, 0, 1]


def test_session_stats(spark):
    rows = [(m(0), 1), (m(5), 1), (m(100), 1)]
    out = {r["session_id"]: r for r in
           session_stats(evts(spark, rows), gap_minutes=30).collect()}
    assert out[0]["n_events"] == 2 and out[0]["duration_us"] == 300_000_000
    assert out[1]["n_events"] == 1 and out[1]["duration_us"] == 0


def test_sessionize_plan_one_exchange(spark):
    """lag + running sum share one partition/order spec: ONE exchange,
    ONE sort, a single Window operator chain — no Python."""
    df = evts(spark, [(m(0), 1), (m(1), 2)])
    text = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert text.count("Exchange") == 1, text
    assert "Python" not in text


def test_epoch_micros_ntz_pinned_values(spark):
    """The NTZ wall-clock arithmetic branch, pinned to known epochs —
    independent of spark.sql.session.timeZone by construction."""
    from pyspark.sql import functions as F

    from sdk_spark.operators.sessions import epoch_micros

    df = spark.createDataFrame(
        [("2024-01-01 00:00:07.179575",),
         ("2024-03-10 02:30:00.5",),          # inside the US DST gap
         ("1969-12-31 23:59:59",)],           # pre-epoch
        "s string").select(F.col("s").cast("timestamp_ntz").alias("ts"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = [r["us"] for r in df.select(epoch_micros(df, "ts").alias("us"))
           .collect()]
    assert got == [1704067207179575, 1710037800500000, -1000000]


def test_sessionize_ntz_column(spark):
    """sessionize on a TIMESTAMP_NTZ column (the parquet default)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:10:00", 1),
         (2, "2024-01-01 01:00:00", 1)],
        "event_id long, s string, user_id long") \
        .select("event_id", F.col("s").cast("timestamp_ntz").alias("ts"),
                "user_id")
    got = [r["session_id"] for r in
           sessionize(df).orderBy("event_id").collect()]
    assert got == [0, 0, 1]
