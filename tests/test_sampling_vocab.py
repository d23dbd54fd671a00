"""Stratified sampling + vocabulary top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdk_spark.operators.sampling import cap_per_key, stratified_sample
from sdk_spark.operators.text import vocab_topk


def df_strata(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_exact_n_per_stratum(spark):
    out = stratified_sample(df_strata(spark), "lang", 7).collect()
    from collections import Counter
    counts = Counter(r["lang"] for r in out)
    assert counts == {"a": 7, "b": 7, "c": 7}


def test_stratified_deterministic_under_repartition(spark):
    df = df_strata(spark)
    a = {r["doc_id"] for r in stratified_sample(df, "lang", 5).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(df.repartition(11), "lang", 5).collect()}
    assert a == b


def test_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    assert stratified_sample(df, "lang", 10).count() == 2


def test_stratified_rejects_nonpositive(spark):
    with pytest.raises(ValueError):
        stratified_sample(df_strata(spark), "lang", 0)


def test_cap_per_key_alias(spark):
    assert cap_per_key(df_strata(spark), "lang", 3).count() == 9


def naive_sample(spark, df, strata_col, n, id_col="doc_id"):
    """The full-stratum-sort form (the pre-r4 implementation) as the
    exactness reference for the two-phase selection."""
    from pyspark.sql import Window
    from sdk_spark.operators.sampling import _det_order
    w = Window.partitionBy(strata_col).orderBy(_det_order(id_col),
                                               F.col(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n).drop("__rk"))


def test_stratified_two_phase_matches_naive_exactly(spark):
    """Row-for-row identical to the full-sort form on a skewed input
    (one huge stratum, several small ones, plus a NULL stratum)."""
    rows = [(i, "big") for i in range(5000)] \
        + [(10_000 + i, "mid") for i in range(40)] \
        + [(20_000 + i, "tiny") for i in range(3)] \
        + [(30_000 + i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    want = {(r["doc_id"], r["lang"]) for r in
            naive_sample(spark, df, "lang", 7).collect()}
    got = {(r["doc_id"], r["lang"]) for r in
           stratified_sample(df, "lang", 7).collect()}
    assert got == want


def test_stratified_null_ids_rank_first_like_naive(spark):
    """NULL ids must not be silently dropped by the hash prefilter: the
    naive full-sort form ranks them first (ASC NULLS FIRST on the order
    hash), so _det_order maps them to -1 and the two-phase row set
    agrees — including a stratum big enough that the prefilter is
    active (r4 review finding)."""
    rows = [(i, "big") for i in range(2000)] + [(None, "big")] \
        + [(10_000 + i, "small") for i in range(5)] + [(None, "small")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, "lang", 4).collect()
    want = naive_sample(spark, df, "lang", 4).collect()
    assert {(r["doc_id"], r["lang"]) for r in got} \
        == {(r["doc_id"], r["lang"]) for r in want}
    # the null-id row is inside the sample of BOTH strata
    assert {r["lang"] for r in got if r["doc_id"] is None} \
        == {"big", "small"}


def test_stratified_deficiency_guard_still_exact(spark):
    """With a deliberately starved margin (oversample=1, slack=0) the
    prefilter under-selects some strata; the guard's fallback pass must
    restore the exact naive row set."""
    rows = [(i * 7 + 1, ["a", "b", "c", "d"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    want = {r["doc_id"] for r in
            naive_sample(spark, df, "lang", 25).collect()}
    got = {r["doc_id"] for r in
           stratified_sample(df, "lang", 25, oversample=1,
                             slack=0).collect()}
    assert got == want


def test_stratified_plan_prefilters_before_window(spark):
    """Scale pin: the main row_number window must rank only
    hash-threshold survivors — a Filter on the selection hash sits below
    the Window, so no stratum is ever fully sorted in one task."""
    df = df_strata(spark)
    text = stratified_sample(df, "lang", 5) \
        ._jdf.queryExecution().executedPlan().toString()
    filt = [ln for ln in text.splitlines()
            if "1000000007) END < CASE WHEN" in ln
            and ("Filter" in ln or "Join" in ln)]
    assert filt, text


def test_vocab_topk_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b a a  c B"), (2, "a c d"), (3, None)], "doc_id long, text string")
    out = [(r["token"], r["freq"]) for r in vocab_topk(df, k=3).collect()]
    # lowercased: a=3, b=2, c=2 (b before c on tiebreak)
    assert out == [("a", 3), ("b", 2), ("c", 2)]


def test_vocab_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    text = vocab_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in text
    assert "Python" not in text
