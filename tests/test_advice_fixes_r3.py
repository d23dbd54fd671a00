"""Regression tests for round-2 advisor findings (ADVICE.md, round 3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

META = "https://json-structure.org/meta/extended/v0/#"


# -- ADVICE 1: validate_json_auto NULL / malformed-doc guard -------------------

def _doc_schema():
    return {"$schema": META, "$id": "https://t.local/d", "name": "D",
            "$uses": ["JSONStructureValidation"],
            "type": "object",
            "properties": {"a": {"type": "int32", "minimum": 0}},
            "required": ["a"]}


def test_json_auto_flags_null_and_malformed_docs(spark):
    """Catalyst json path and the Arrow kernel must agree on NULL /
    unparseable / non-object documents: INSTANCE_TYPE_MISMATCH at '#',
    never silently VALID (ADVICE r2 #1)."""
    from sdk_spark.plans.auto import validate_json_auto
    from sdk_spark.operators.jsonbatch import validate_json_column

    rows = [(0, '{"a": 1}'),       # valid
            (1, None),             # NULL document
            (2, '{bad json'),      # unparseable
            (3, '5'),              # scalar root
            (4, 'null'),           # JSON null root
            (5, '{"a": -3}')]      # parseable, constraint violation
    df = spark.createDataFrame(rows, "rid long, doc string")

    viol, path = validate_json_auto(df, "doc", _doc_schema(), ["rid"])
    assert path == "catalyst"
    got = {(r["rid"], r["constraint_id"], r["path"]) for r in viol.collect()}
    kernel = {(r["rid"], r["constraint_id"], r["path"])
              for r in validate_json_column(
                  df, "doc", _doc_schema(), key_cols=["rid"]).collect()}
    # same verdict structure on every row; in particular rows 1-4 are all
    # flagged at '#', and NO required-property noise is emitted for them
    assert got == kernel
    for rid in (1, 2, 3, 4):
        assert (rid, "INSTANCE_TYPE_MISMATCH", "#") in got
    assert not any(r == 1 and c != "INSTANCE_TYPE_MISMATCH"
                   for r, c, _p in got)


def test_json_auto_null_value_column_parity(spark):
    """Value column parity on the guard rows: NULL doc → NULL value,
    malformed → raw text, JSON null → NULL (kernel renders None)."""
    from sdk_spark.plans.auto import validate_json_auto

    df = spark.createDataFrame(
        [(1, None), (2, '{oops'), (4, 'null')], "rid long, doc string")
    viol, _ = validate_json_auto(df, "doc", _doc_schema(), ["rid"])
    vals = {r["rid"]: r["value"] for r in viol.collect()}
    assert vals[1] is None
    assert vals[2] == "{oops"
    assert vals[4] is None


# -- ADVICE 4: regex dialect guard ---------------------------------------------

def test_java_safe_rejects_scoped_and_negated_python_flags(spark):
    from sdk_spark.functions.regex_dialect import java_safe

    assert not java_safe("(?a-i:x)")     # scoped + negated, ASCII flag
    assert not java_safe("(?a:x)")       # scoped ASCII flag
    assert not java_safe("(?ai)x")       # plain form (regression)
    assert java_safe("(?i:x)")           # Java-legal scoped flag stays fast


def test_java_safe_rejects_in_class_java_metachars(spark):
    """`[a&&b]` and `[a[b]]` compile in BOTH dialects but mean different
    things (Java: intersection / union) — must route to the Python path."""
    from sdk_spark.functions.regex_dialect import java_safe

    assert not java_safe("[a&&b]")
    assert not java_safe("[a[b]]c")
    assert java_safe(r"[a\[b]c")         # escaped → literal in both
    assert java_safe("[a&b]")            # single & is literal in both


def test_java_safe_without_jvm_is_conservative(monkeypatch):
    """No active session → not java-safe: a wrong True would throw
    PatternSyntaxException on the executors mid-job (ADVICE r2 #4)."""
    from pyspark.sql import SparkSession
    from sdk_spark.functions import regex_dialect as rd

    monkeypatch.setattr(SparkSession, "getActiveSession",
                        classmethod(lambda cls: None))
    assert not rd.java_safe("abc+")


# -- ADVICE 3: exact decimal bounds --------------------------------------------

def _dec_schema(**bounds):
    return {"$schema": META, "$id": "https://t.local/m", "name": "M",
            "$uses": ["JSONStructureValidation"],
            "type": "object",
            "properties": {"v": {"type": "decimal", **bounds}}}


def _dec_violations(spark, values, **bounds):
    from sdk_spark.compiler.core import CompiledSchema, violation_rows

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "rid long, v string")
    plan = CompiledSchema(_dec_schema(**bounds), extended=True)
    return {r["rid"] for r in
            violation_rows(plan.validate(df), ["rid"]).collect()}


def test_decimal_bounds_wide_integer_digits(spark):
    """>26 integer digits overflowed decimal(38,12) → NULL → false
    violation before; the digit-string compare is exact (ADVICE r2 #3)."""
    big = "9" * 30                       # 30 digits, >> decimal(38,12)
    bad = {_i for _i in _dec_violations(
        spark, [big, "-" + big, "5"], minimum="0")}
    assert bad == {1}                    # only the negative one is below 0


def test_decimal_bounds_deep_fractional_digits(spark):
    """>12 fractional digits used to round inside decimal(38,12); the
    truncation+tail scheme is exact at arbitrary depth."""
    vals = ["1.0000000000000001",        # just above 1 at the 16th place
            "1.0000000000000000",        # exactly 1
            "0.9999999999999999"]        # just below 1
    assert _dec_violations(spark, vals, maximum="1") == {0}
    assert _dec_violations(spark, vals, minimum="1") == {2}
    assert _dec_violations(spark, vals, exclusiveMinimum="1") == {1, 2}
    assert _dec_violations(spark, vals, exclusiveMaximum="1") == {0, 1}


def test_decimal_bounds_match_row_kernel(spark):
    """Differential: Catalyst decimal bounds == row kernel (Decimal exact)
    across signs, zeros, and truncation edges."""
    from sdk_spark.rowcheck import RowChecker

    vals = ["-1.55", "-1.5", "-1.45", "-0.05", "0", "0.0", "1.49999",
            "1.5", "1.50", "1.500001", "2", "-2", "1e1", "0.15e1"]
    for bounds in ({"minimum": "-1.5"}, {"maximum": "1.5"},
                   {"exclusiveMinimum": "-1.5"}, {"exclusiveMaximum": "1.5"},
                   {"minimum": "0"}, {"maximum": "0"}):
        got = _dec_violations(spark, vals, **bounds)
        checker = RowChecker(_dec_schema(**bounds), extended=True)
        want = {i for i, v in enumerate(vals)
                if any(f.code.startswith("INSTANCE_NUMBER")
                       for f in checker.check({"v": v}))}
        assert got == want, (bounds, got, want)


# -- ADVICE 5: gated_broadcast persist lifecycle --------------------------------

def test_probe_cache_is_bounded_and_releasable(spark):
    from sdk_spark.operators import table_checks as tc

    tc.release_probe_cache()
    handles = []
    for i in range(tc._PROBE_CACHE_MAX + 4):
        df = spark.range(5).withColumn("k", F.col("id") + i)
        tc.gated_broadcast(df, 1000)
        handles.append(df)
    assert len(tc._PROBE_CACHE) == tc._PROBE_CACHE_MAX
    tc.release_probe_cache()
    assert len(tc._PROBE_CACHE) == 0
    # every handle the cache evicted or released is actually unpersisted
    for df in tc._PROBE_CACHE:
        assert df.storageLevel.useMemory or df.storageLevel.useDisk


def test_gated_broadcast_size_aware_cap(spark):
    """A wide-key set trips the byte budget long before the row threshold:
    with a tiny budget the hint must NOT be applied even under the row
    cap (ADVICE/VERDICT r2: rows×width, not rows)."""
    from sdk_spark.operators.table_checks import (
        estimated_row_bytes, gated_broadcast)

    wide = spark.range(200).select(
        F.col("id").alias("k"),
        *[F.concat(F.lit("x"), F.col("id").cast("string")).alias(f"c{i}")
          for i in range(8)])
    assert estimated_row_bytes(wide.schema) >= 8 * 48
    fact = spark.range(500).select(F.col("id").alias("k"))

    def _hinted(right):
        plan = (fact.join(right, "k")
                ._jdf.queryExecution().analyzed().toString())
        return "broadcast" in plan.lower()

    assert not _hinted(gated_broadcast(wide, 1_000_000, max_bytes=1024))
    assert _hinted(gated_broadcast(wide.limit(2), 1_000_000, max_bytes=1024))


def test_fk_orphans_gated_dim_falls_back(spark):
    """fk_orphans routes the dim through the gate: threshold 0 → no
    broadcast hint, results identical either way (VERDICT r2 wrong-#3)."""
    from sdk_spark.operators.table_checks import fk_orphans

    fact = spark.createDataFrame([(i, i % 7) for i in range(50)],
                                 "rid long, fk long")
    dim = spark.createDataFrame([(i,) for i in range(5)], "pk long")
    hinted = fk_orphans(fact, ["fk"], dim, ["pk"])
    unhinted = fk_orphans(fact, ["fk"], dim, ["pk"], broadcast_threshold=0)
    assert ("broadcast" not in
            unhinted._jdf.queryExecution().optimizedPlan().toString().lower())
    assert (sorted(r["rid"] for r in hinted.collect())
            == sorted(r["rid"] for r in unhinted.collect()))


# -- VERDICT wrong-#1/#4: similarity defaults -----------------------------------

def test_with_lsh_bucket_requires_dim(spark):
    from sdk_spark.operators.similarity import with_lsh_bucket

    df = spark.createDataFrame([(0, [1.0, 0.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        with_lsh_bucket(df)


def test_cosine_near_duplicates_caps_by_default(spark):
    """Default cap = dedup.DEFAULT_MAX_BUCKET: a planted mega-bucket is
    dropped unless the caller explicitly uncaps (VERDICT r2 wrong-#1)."""
    from sdk_spark.operators.dedup import DEFAULT_MAX_BUCKET
    from sdk_spark.operators.similarity import cosine_near_duplicates

    n = DEFAULT_MAX_BUCKET + 5
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0))
        .cast("array<float>").alias("embedding"))
    capped = cosine_near_duplicates(df, threshold=0.99, n_planes=6, dim=4)
    assert capped.count() == 0
    explicit = cosine_near_duplicates(df.limit(3), threshold=0.99,
                                      n_planes=6, dim=4,
                                      max_bucket_size=None)
    assert explicit.count() == 3        # 3 choose 2 pairs, all identical
