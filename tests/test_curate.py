"""End-to-end corpus curation pipeline on a planted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdk_spark.operators.curate import curate_corpus

GOOD_EN = ("the quick brown fox jumps over the lazy dog and then the dog "
           "chases the fox around the old farm while the farmer watches "
           "them play in the warm afternoon sun near the quiet river")
GOOD_DE = ("der schnelle braune fuchs springt über den faulen hund und "
           "dann jagt der hund den fuchs um den alten bauernhof herum "
           "während der bauer ihnen beim spielen zusieht und die sonne")


WORDS = ("the and for with from this that have been will would could into "
         "over under where when what about their other more some time very "
         "house water light sound place world group still between").split()


def _doc(i: int) -> str:
    """Genuinely distinct English text per doc: a seeded random shuffle of
    the word bank.  Char-5 shingles crossing word boundaries dominate the
    shingle set, so random orders keep pairwise Jaccard well under the
    0.8 near-dup threshold while every word stays English."""
    import random

    picks = random.Random(i).sample(WORDS * 2, 40)
    return " ".join(["the"] + picks + ["and", "done", f"tag{i}"])


def planted_corpus(spark):
    rows = []
    for i in range(40):                      # unique good English docs
        rows.append((i, _doc(i)))
    rows.append((100, rows[0][1]))           # exact dup of doc 0
    rows.append((101, rows[1][1] + " x"))    # near dup of doc 1
    rows.append((102, GOOD_DE))              # wrong language
    rows.append((103, "$$$ 123 !!! 456 ###"))  # garbage quality
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_end_to_end(spark):
    df = planted_corpus(spark)
    out, audit = curate_corpus(df, max_tokens=128,
                               weights={"train": 80, "valid": 20})
    rows = out.collect()
    ids = sorted(r["doc_id"] for r in rows)

    stages = {a["stage"]: a["rows"] for a in audit}
    assert stages["input"] == 44
    assert stages["after_exact_dedup"] == 43          # dup 100 gone
    assert stages["after_near_dedup"] == 42           # near-dup 101 gone
    assert stages["after_quality_lang_gate"] == 40    # 102, 103 gone
    assert stages["output"] == 40
    assert 100 not in ids and 101 not in ids
    assert 102 not in ids and 103 not in ids
    assert set(ids) == set(range(40))

    # split AND bin assignment are deterministic under repartitioning
    splits = {r["doc_id"]: (r["split"], r["bin_id"]) for r in rows}
    out2, _ = curate_corpus(df.repartition(7), max_tokens=128,
                            weights={"train": 80, "valid": 20},
                            report=False)
    assert {r["doc_id"]: (r["split"], r["bin_id"])
            for r in out2.collect()} == splits

    # bins never exceed the budget; split separation is structural
    # (each split packs independently, (split, bin_id) is the bin key)
    from collections import defaultdict
    per_bin = defaultdict(int)
    for r in rows:
        per_bin[(r["split"], r["bin_id"])] += r["n_tokens"]
    assert all(tot <= 128 for tot in per_bin.values())
    # helper scoring columns are dropped from the contract schema
    assert "hits_en" not in out.columns and "punct_ratio" not in out.columns


def test_curate_report_off_is_lazy(spark):
    out, audit = curate_corpus(planted_corpus(spark), report=False)
    assert audit == []
    assert out.count() > 0


def test_curate_accepts_pretokenized_input(spark):
    """An input that ALREADY has n_tokens must not yield duplicate
    columns; the pipeline's recount replaces it cleanly."""
    df = planted_corpus(spark).withColumn(
        "n_tokens", F.lit(999).cast("long"))
    out, _ = curate_corpus(df, max_tokens=128, report=False)
    assert out.columns.count("n_tokens") == 1
    assert out.where(F.col("n_tokens") == 999).count() == 0  # recounted
