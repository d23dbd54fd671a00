"""Unit tests: text analysis, dedup tiers, similarity search, table checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest to find a quiet place for sleeping")
    rows = [
        (0, base),
        (1, base.replace("quiet", "silent")),          # near-dup of 0
        (2, "Der Hund und die Katze sind nicht mit der Maus zu sehen und das ist gut"),
        (3, "le chat et le chien sont dans la maison et les oiseaux pour une fois"),
        (4, "completely different text about spark catalyst optimizer internals"),
        (5, base.upper()),                              # exact dup modulo case
        (6, base),                                      # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_and_quality(spark, docs):
    from sdk_spark.operators.text import quality_features, quality_score

    row = quality_features(docs).where("doc_id = 0").first()
    assert row["n_tokens"] == len(row["text"].split())
    assert row["n_chars_calc"] == len(row["text"])
    assert row["stop_hits"] >= 4  # the/the/and/a/to/for...
    q = quality_score(docs).select("doc_id", "quality_score").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in q)


def test_lang_id(spark, docs):
    from sdk_spark.operators.text import lang_id

    got = {r["doc_id"]: r["pred_lang"]
           for r in lang_id(docs).select("doc_id", "pred_lang").collect()}
    assert got[0] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"


def test_exact_duplicates(spark, docs):
    from sdk_spark.operators.dedup import distinct_by_content, exact_duplicates

    groups = exact_duplicates(docs).collect()
    # doc 5 (case variant) and doc 6 (identical) normalize to doc 0's text
    assert len(groups) == 1
    assert sorted(groups[0]["ids"]) == [0, 5, 6]
    kept = distinct_by_content(docs).select("doc_id").collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert 0 in kept_ids and 5 not in kept_ids and 6 not in kept_ids
    assert {1, 2, 3, 4} <= kept_ids


def test_minhash_near_duplicates(spark, docs):
    from sdk_spark.operators.dedup import near_duplicates_minhash

    pairs = near_duplicates_minhash(docs, threshold=0.6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found            # single-word mutation
    assert (0, 6) in found            # identical
    assert all(r["jaccard"] >= 0.6 for r in pairs)
    assert not any(4 in p for p in found)  # unrelated doc never pairs


def test_minhash_engines_agree(spark, docs):
    """Arrow (numpy kernel) and SQL (Catalyst HOF) signature engines are
    different uniform hashes with the same Broder banding math: at the
    oracle banding (miss prob ~1e-8 for J >= threshold) both must emit the
    IDENTICAL final pair set, with identical exact-Jaccard values (the
    rescore definition is shared)."""
    from sdk_spark.operators.dedup import near_duplicates_minhash

    def run(engine):
        return {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in near_duplicates_minhash(
                    docs, threshold=0.5, num_hashes=64, bands=32,
                    engine=engine).collect()}

    arrow, sql = run("arrow"), run("sql")
    assert arrow == sql and arrow


def test_simhash_near_duplicates(spark, docs):
    from sdk_spark.operators.dedup import simhash_candidates

    cands = simhash_candidates(docs).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in cands}
    assert by_pair.get((0, 6)) == 0   # identical text → identical simhash
    assert by_pair.get((0, 1), 99) <= 6


def test_cosine_topk_and_ann(spark):
    import numpy as np

    from sdk_spark.operators.similarity import cosine_topk, lsh_bucket_topk

    rng = np.random.RandomState(7)
    dim = 16
    vecs = rng.normal(size=(200, dim)).astype("float32")
    # plant true near neighbors of vector 17 at ids 300..302
    for j in range(3):
        vecs = np.vstack([vecs, vecs[17] + rng.normal(scale=0.05, size=dim)
                          .astype("float32")])
    query = list(vecs[17].astype(float))
    rows = [(i if i < 200 else 300 + (i - 200), [float(x) for x in v])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = cosine_topk(df, query, k=4).collect()
    assert exact[0]["vec_id"] == 17 and exact[0]["score"] > 0.999
    assert {r["vec_id"] for r in exact} == {17, 300, 301, 302}

    ann = lsh_bucket_topk(df, query, k=4, n_planes=10, multiprobe=1).collect()
    assert ann and ann[0]["vec_id"] == 17  # self must be in its own bucket
    # planted near-neighbors land in the same/adjacent buckets
    assert len({r["vec_id"] for r in ann} & {300, 301, 302}) >= 2


def test_ivf_topk_matches_in_cell_bruteforce(spark):
    import numpy as np

    from sdk_spark.operators.similarity import cosine_topk, ivf_bucket, ivf_topk
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = [1.0, 1.0] + [0.0] * 6
    ann = ivf_topk(df, query, k=5, nbits=3).collect()
    # oracle: brute force restricted to the query's sign cell
    cell = df.where(ivf_bucket(F.col("embedding"), 3) == 7)  # query signs: +++
    exact = cosine_topk(cell, query, k=5).collect()
    assert [r["vec_id"] for r in ann] == [r["vec_id"] for r in exact]
    assert all(abs(a["score"] - e["score"]) < 1e-12
               for a, e in zip(ann, exact))


def test_cosine_near_duplicates(spark):
    from sdk_spark.operators.similarity import cosine_near_duplicates

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_duplicates(df, threshold=0.95, n_planes=8, dim=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}


def test_lsh_bucket_survives_lambda_variable_column_names(spark):
    """Review regression: the signature SQL splices lambdas (acc, p, x, y,
    s, v); a vector column NAMED like one of them must not be captured —
    pre-fix, vec_col='p' dotted each plane with itself (every row in the
    all-ones bucket) and 'acc' failed analysis."""
    import numpy as np

    from sdk_spark.operators.similarity import with_lsh_bucket

    rows = [(i, [float(x) for x in np.random.RandomState(i).normal(size=8)])
            for i in range(40)]
    ref = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expected = {r["vec_id"]: r["lsh_bucket"]
                for r in with_lsh_bucket(ref, "embedding", 6, 42, 8).collect()}
    assert len(set(expected.values())) > 1
    for bad_name in ("p", "acc", "x", "s"):
        renamed = ref.withColumnRenamed("embedding", bad_name)
        got = {r["vec_id"]: r["lsh_bucket"]
               for r in with_lsh_bucket(renamed, bad_name, 6, 42, 8).collect()}
        assert got == expected, bad_name


def test_lsh_bucket_resolves_nested_vec_col(spark):
    """vec_col goes through F.col, so dotted struct references resolve."""
    import numpy as np

    from sdk_spark.operators.similarity import with_lsh_bucket

    rows = [(i, ([float(x) for x in np.random.RandomState(i).normal(size=8)],))
            for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id long, meta struct<embedding: array<float>>")
    flat = df.select("vec_id", F.col("meta.embedding").alias("embedding"))
    expected = {r["vec_id"]: r["lsh_bucket"]
                for r in with_lsh_bucket(flat, "embedding", 6, 42, 8).collect()}
    got = {r["vec_id"]: r["lsh_bucket"]
           for r in with_lsh_bucket(df, "meta.embedding", 6, 42, 8).collect()}
    assert got == expected


def test_vec_literal_non_finite(spark):
    """NaN/inf query components build valid literals (pre-fix: bare 'nan'
    parsed as a column reference)."""
    from sdk_spark.operators.similarity import _as_vec_lit

    row = spark.range(1).select(
        _as_vec_lit([float("nan"), float("inf"), float("-inf"), 1.5])
        .alias("v")).first()
    assert row["v"][0] != row["v"][0]
    assert row["v"][1] == float("inf") and row["v"][2] == float("-inf")
    assert row["v"][3] == 1.5


def test_fk_orphans_planted(spark):
    from sdk_spark.operators.table_checks import fk_orphans

    fact = spark.createDataFrame([(1, 10), (2, 11), (3, 99)], "id long, fk long")
    dim = spark.createDataFrame([(10,), (11,)], "pk long")
    orphans = fk_orphans(fact, ["fk"], dim, ["pk"]).collect()
    assert [r["id"] for r in orphans] == [3]


def test_drift_detection(spark):
    from sdk_spark.operators.table_checks import drift, quantile_sketch

    a = spark.range(0, 10000).select((F.col("id") % 100).alias("x"))
    b = spark.range(0, 10000).select((F.col("id") % 100 + 50).alias("x"))
    sa = quantile_sketch(a, ["x"])
    sb = quantile_sketch(b, ["x"])
    same = drift(sa, sa)
    moved = drift(sa, sb)
    assert not same[0]["exceeded"]
    assert moved[0]["exceeded"] and moved[0]["drift_score"] > 0.3


def test_rolling_fingerprint_stability(spark, docs):
    from sdk_spark.operators.text import document_fingerprints

    fps = {r["doc_id"]: (r["fp_exact"], r["fp_rolling"])
           for r in document_fingerprints(docs).collect()}
    assert fps[0] == fps[6]           # identical docs: identical fingerprints
    assert fps[0][0] == fps[5][0]     # case variant: same exact fp (normalized)
    assert fps[0][0] != fps[4][0]


def test_phash_near_duplicates(spark):
    """Banded Hamming LSH on int64 phash: exact recall for
    max_distance < bands, hot-key collapse, no Python in the hot path."""
    import pytest
    from sdk_spark.operators.similarity import phash_near_duplicates

    base = 0x0123456789ABCDEF
    rows = [("a1", base), ("a2", base ^ 0b101), ("a3", base ^ (1 << 40)),
            ("far", base ^ 0x00FF00FF00FF00FF)]
    rows += [(f"hot{i}", 42) for i in range(500)]   # 30%-style hot key
    df = spark.createDataFrame(rows, "image_id string, phash long")
    out = phash_near_duplicates(df, max_distance=3, bands=8).collect()
    # pair order follows the numeric hash; normalize by id for comparison
    got = {tuple(sorted((r["id_a"], r["id_b"]))): r["hamming"] for r in out}
    assert got == {("a1", "a2"): 2, ("a1", "a3"): 1, ("a2", "a3"): 3}
    # identical-hash rows collapse to one representative (no hot self-pairs)
    assert all("hot" not in a and "hot" not in b for a, b in got)

    with pytest.raises(ValueError, match="recall guarantee"):
        phash_near_duplicates(df, max_distance=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        phash_near_duplicates(df, bands=7)


def test_phash_members_counts(spark):
    from sdk_spark.operators.similarity import phash_near_duplicates

    rows = [(f"x{i}", 100) for i in range(7)] + [("y", 101)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    out = phash_near_duplicates(df, max_distance=3, bands=8).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["members_a"], r["members_b"]} == {7, 1}
    assert r["hamming"] == 1


def test_psi_drift_detects_shift(spark):
    from pyspark.sql import functions as F

    from sdk_spark.operators.table_checks import psi_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "x double")
    b_same = spark.createDataFrame([(float(i % 10),) for i in range(500)], "x double")
    b_shift = spark.createDataFrame([(float(i % 3),) for i in range(500)], "x double")
    bucket = F.floor(F.col("x")).cast("long")

    def total(df_b):
        rows = psi_drift(a, df_b, bucket).collect()
        return sum(r["psi_contrib"] for r in rows)

    assert total(b_same) < 0.01            # identical distribution
    assert total(b_shift) > 0.5            # gross shift: PSI >> 0.25 bar


def test_psi_drift_one_sided_bucket_finite(spark):
    from pyspark.sql import functions as F

    from sdk_spark.operators.table_checks import psi_drift

    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    b = spark.createDataFrame([(1.0,), (9.0,)], "x double")  # bucket 9 only in b
    rows = psi_drift(a, b, F.floor(F.col("x")).cast("long")).collect()
    import math
    assert all(math.isfinite(r["psi_contrib"]) for r in rows)
    assert {r["bucket"] for r in rows} == {1, 2, 9}


def test_normalize_text_paths(spark):
    from pyspark.sql import functions as F

    from sdk_spark.operators.text import normalize_text

    decomposed = "Café"                 # e + combining acute
    rows = [(1, "  a\tb\n\nc  "), (2, "x\x00y\x1fz"),
            (3, decomposed), (4, None), (5, "MiXeD Case")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_norm"] for r in
           normalize_text(df).collect()}
    assert out[1] == "a b c"
    assert out[2] == "x y z"                  # controls -> spaces, collapsed
    assert out[3] == "Caf\u00e9" and len(out[3]) == 4   # NFC composed
    assert out[4] is None
    assert out[5] == "MiXeD Case"             # lowercase off by default
    low = {r["doc_id"]: r["text_norm"] for r in
           normalize_text(df, lowercase=True, nfc=False).collect()}
    assert low[5] == "mixed case"
    # the nfc=False path is pure Catalyst (no Python in the plan)
    plan = normalize_text(df, nfc=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Eval" not in plan
