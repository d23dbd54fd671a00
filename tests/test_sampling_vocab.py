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
