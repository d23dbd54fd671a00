"""End-to-end corpus curation: the tier's operators composed into one call.

The standard web-corpus build, in the standard order (each stage shrinks
the data the next one touches, so the expensive quadratic-ish stages see
the smallest input):

1. **exact dedup** — linear fingerprint pass first; byte-identical
   boilerplate never reaches the LSH stage.
2. **near-dup clustering** — MinHash-LSH pairs → connected components →
   keep each cluster's minimum id (``cluster.resolve_duplicates``).
3. **quality + language gate** — one projection computing quality score
   and language id; rows failing either threshold drop.
4. **deterministic split** — multiplicative-hash train/valid/test
   (stable under re-runs and cluster sizes).
5. **sequence packing** — next-fit token bins per split, packed
   independently so a bin never mixes train and valid rows; the unique
   bin key of the output is (split, bin_id).

Every stage is the already-tested operator; this module adds only the
composition and a per-stage audit report.  The report is computed from
ONE action per stage boundary (counts), which is the price of an audit —
pass ``report=False`` to skip all counting and keep the plan fully lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import resolve_duplicates
from .dedup import distinct_by_content, near_duplicates_minhash
from .packing import hash_split, pack_sequences
from .text import lang_id, quality_score, token_count_ws


def curate_corpus(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  languages: tuple[str, ...] = ("en",),
                  min_quality: float = 0.35,
                  jaccard_threshold: float = 0.8,
                  max_tokens: int = 2048,
                  weights: dict[str, int] | None = None,
                  report: bool = True
                  ) -> tuple[DataFrame, list[dict]]:
    """Run the full curation pipeline; returns (curated, stage_report).

    ``curated`` columns: every input column plus ``pred_lang``,
    ``quality_score``, ``split``, ``n_tokens``, ``bin_id``.
    ``stage_report`` is a list of {stage, rows} dicts (empty when
    ``report=False``).
    """
    weights = weights or {"train": 95, "valid": 5}
    audit: list[dict] = []

    def note(stage: str, frame: DataFrame) -> None:
        if report:
            audit.append({"stage": stage, "rows": frame.count()})

    note("input", df)

    exact = distinct_by_content(df, id_col=id_col, text_col=text_col)
    note("after_exact_dedup", exact)

    pairs = near_duplicates_minhash(exact, id_col=id_col, text_col=text_col,
                                    threshold=jaccard_threshold)
    near = resolve_duplicates(exact, pairs, id_col=id_col)
    note("after_near_dedup", near)

    scored = quality_score(
        lang_id(near, text_col=text_col), text_col=text_col)
    kept = scored.where(
        F.col("pred_lang").isin(*languages)
        & (F.col("quality_score") >= F.lit(min_quality)))
    note("after_quality_lang_gate", kept)

    split = hash_split(kept, id_col, weights)

    toks = split.withColumn("n_tokens", token_count_ws(F.col(text_col)))
    # pack each split independently so a bin can never mix train and
    # valid rows; (split, bin_id) is the unique bin key of the output
    packs = [
        pack_sequences(toks.where(F.col("split") == name)
                       .select(id_col, "n_tokens"),
                       id_col=id_col, tokens_col="n_tokens",
                       max_tokens=max_tokens)
        .select(F.col("id").alias(id_col), "bin_id")
        for name in weights
    ]
    packed = packs[0]
    for p in packs[1:]:
        packed = packed.unionByName(p)
    out = toks.join(packed, id_col)
    note("output", out)
    return out, audit
