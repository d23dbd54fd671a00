"""Gap-based sessionization vs a pure-Python reference walk."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


def test_sessionize_legacy_plan_one_exchange(spark):
    """chunk_gaps=None: lag + running sum share one partition/order spec —
    ONE exchange, ONE sort, a single Window operator chain, no Python."""
    df = evts(spark, [(m(0), 1), (m(1), 2)])
    text = sessionize(df, chunk_gaps=None) \
        ._jdf.queryExecution().executedPlan().toString()
    assert text.count("Exchange") == 1, text
    assert "Python" not in text


def _ids(df):
    return {(r["user_id"], r["event_id"]): r["session_id"]
            for r in df.collect()}


def _random_walk(n=400, users=3, seed=7):
    """Deterministic adversarial walk: bursts, dead air, exact-boundary
    gaps, equal timestamps (tiebreak), pre-epoch start."""
    import random

    rng = random.Random(seed)
    rows, t = [], {u: dt.datetime(1969, 12, 31, 22, 0) for u in range(users)}
    for _ in range(n):
        u = rng.randrange(users)
        step = rng.choice([0, 1, 29, 30, 31, 60, 300,
                           30 * 16, 30 * 16 + 1])  # minutes; incl. chunk edges
        t[u] = t[u] + dt.timedelta(minutes=step)
        rows.append((t[u], u))
    return rows


def test_sessionize_chunked_matches_legacy(spark):
    """The skew-safe (key, chunk) plan is bit-identical to the single
    window — for the default width AND the pathological 1-gap chunks
    where every session spans a merge chain."""
    df = evts(spark, _random_walk())
    want = _ids(sessionize(df, gap_minutes=30, chunk_gaps=None))
    assert _ids(sessionize(df, gap_minutes=30)) == want
    assert _ids(sessionize(df, gap_minutes=30, chunk_gaps=1)) == want


def test_sessionize_merge_chain_across_chunks(spark):
    """One unbroken session crossing many chunk boundaries (chunk = 1 gap;
    events every 10 min for 5 h) collapses to a single id."""
    rows = [(m(10 * i), 1) for i in range(31)]
    got = sessionize(evts(spark, rows), gap_minutes=30, chunk_gaps=1)
    assert {r["session_id"] for r in got.collect()} == {0}


def test_sessionize_boundary_gap_across_chunks(spark):
    """Exactly-gap spacing that ALSO lands on a chunk boundary stays in
    one session; one extra microsecond splits (same rule as in-chunk)."""
    rows = [(m(0), 1), (m(30 * 16), 1),                 # chunk edge, gap>30
            (m(30 * 17), 1),                            # exactly gap later
            (m(30 * 18) + dt.timedelta(microseconds=1), 1)]
    got = [r["session_id"] for r in
           sessionize(evts(spark, rows), gap_minutes=30)
           .orderBy("event_id").collect()]
    assert got == [0, 1, 1, 2]


def test_sessionize_hot_key_is_split(spark):
    """VERDICT r4 #3: a bot key holding 50% of all events must NOT funnel
    through a single task — its rows come out of the (key, chunk) window
    spread across partitions, and the ids still match the legacy plan."""
    bot = [(m(2 * i), 99) for i in range(600)]          # 20 h of bot traffic
    rest = [(m(7 * i), u) for u in range(1, 5) for i in range(150)]
    df = evts(spark, bot + rest).repartition(8)
    chunked = sessionize(df, gap_minutes=30)
    assert _ids(chunked) == _ids(sessionize(df, gap_minutes=30,
                                            chunk_gaps=None))
    # AQE coalesces this tiny test shuffle into one partition, which would
    # mask the split — measure the raw (key, chunk) hash partitioning
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key)
    try:
        spark.conf.set(coalesce_key, "false")
        pids = (sessionize(df, gap_minutes=30)
                .where(F.col("user_id") == 99)
                .select(F.spark_partition_id().alias("pid"))
                .distinct().count())
    finally:
        spark.conf.set(coalesce_key, old)
    assert pids > 1, "hot key still funnels through one task"
    text = chunked._jdf.queryExecution().executedPlan().toString()
    # the event-grain window partitions by the (key, chunk) struct,
    # never the key alone
    assert "windowspecdefinition(__j" in text, text
    assert "windowspecdefinition(user_id" not in text, text


def test_sessionize_null_key_and_ts_survive(spark):
    """Chunked plan keeps NULL-key and NULL-timestamp rows (struct join is
    null-safe per field) with ids identical to the legacy plan — a plain
    equi-join rejoin silently dropped them (r5 review finding)."""
    rows = [(0, m(0), None), (1, m(10), None), (2, m(100), None),
            (3, None, 1), (4, None, 1), (5, m(0), 1), (6, m(10), 1)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    chunked = sessionize(df, gap_minutes=30)
    legacy = sessionize(df, gap_minutes=30, chunk_gaps=None)
    assert chunked.count() == 7
    assert _ids(chunked) == _ids(legacy)


def test_sessionize_gap_zero_falls_back(spark):
    """gap 0 (chunk width 0) routes to the legacy plan instead of dividing
    by zero / emptying the result."""
    rows = [(m(0), 1), (m(0), 1), (m(1), 1)]
    got = sessionize(evts(spark, rows), gap_minutes=0)
    assert [r["session_id"] for r in got.orderBy("event_id").collect()] \
        == [0, 0, 1]


def test_sessionize_replaces_existing_session_id(spark):
    """An input that already has session_id gets it replaced in place on
    both plans — never a duplicate column."""
    df = evts(spark, [(m(0), 1), (m(100), 1)]) \
        .withColumn("session_id", F.lit(99))
    for kw in ({}, {"chunk_gaps": None}):
        out = sessionize(df, gap_minutes=30, **kw)
        assert out.columns.count("session_id") == 1
        assert sorted(r["session_id"] for r in out.collect()) == [0, 1]


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
