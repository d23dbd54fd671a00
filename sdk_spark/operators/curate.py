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
5. **sequence packing** — next-fit token bins via one fused full-row
   kernel whose bin state resets at split boundaries, so a bin never
   mixes train and valid rows; ``bin_id`` is globally unique on its own
   (and therefore so is (split, bin_id), the key downstream audits use).

Every stage is the already-tested operator; this module adds only the
composition and a per-stage audit report.  With ``report=True`` each
stage frame is persisted (serialized, spillable) before its count, so
the audit costs one extra action per stage but never recomputes the
upstream pipeline; each stage's cache is released as soon as its
successor materializes, leaving only the RETURNED frame cached —
call ``curated.unpersist()`` when done with it.  ``report=False`` skips persisting and
counting entirely — note the near-dup clustering stage is inherently
iterative (connected components), so SOME jobs still run at build time
either way; the composition is "as lazy as its laziest stage", not
plan-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import resolve_duplicates
from .dedup import distinct_by_content, near_duplicates_minhash
from .packing import hash_split, pack_rows
from .text import lang_id, quality_score


def curate_corpus(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  languages: tuple[str, ...] = ("en",),
                  min_quality: float = 0.35,
                  jaccard_threshold: float = 0.8,
                  max_tokens: int = 2048,
                  weights: dict[str, int] | None = None,
                  report: bool = True,
                  pack_partitions: int | None = 64,
                  num_hashes: int = 64, bands: int = 16
                  ) -> tuple[DataFrame, list[dict]]:
    """Run the full curation pipeline; returns (curated, stage_report).

    ``curated`` columns: every input column plus ``pred_lang``,
    ``quality_score``, ``n_tokens``, ``split``, ``bin_id`` — scoring
    helper columns are dropped.  ``stage_report`` is a list of
    {stage, rows} dicts (empty when ``report=False``).
    ``pack_partitions`` (default 64) pins the packing layout so bins are
    reproducible across cluster sizes; None keeps the input partitioning
    (fastest, but bin ids then depend on it).
    """
    weights = weights or {"train": 95, "valid": 5}
    # internal scoring/packing names: an input column with one of these
    # names would be silently OVERWRITTEN by quality_features/lang_id and
    # then returned with the internal value — refuse loudly instead (the
    # same guard pack_rows applies to its output columns)
    from .text import LANG_PROFILES

    # Pipeline-OWNED outputs (pred_lang/quality_score/n_tokens/split/
    # bin_id/...) are documented to replace same-named inputs cleanly.
    # The scoring HELPERS are different: the docstring promises they are
    # dropped, so a same-named input column would be silently returned
    # holding the internal recomputed value — refuse loudly instead.
    helpers = {"n_chars_calc", "n_pieces", "avg_token_len", "punct_ratio",
               "digit_ratio", "stop_hits", "hits_zh"} \
        | {f"hits_{lang}" for lang in LANG_PROFILES}
    clash = sorted(set(df.columns) & helpers)
    if clash:
        raise ValueError(
            f"curate_corpus: input columns {clash} collide with internal "
            f"scoring helper columns — rename them first")
    audit: list[dict] = []
    prev_cached: list[DataFrame] = []

    def note(stage: str, frame: DataFrame, cache: bool = True) -> DataFrame:
        if report:
            if cache:
                from pyspark import StorageLevel

                frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
            audit.append({"stage": stage, "rows": frame.count()})
            # the count materialized this stage; its PREDECESSOR cache has
            # served its purpose and can go — only the newest stage (and
            # finally the returned frame) stays cached, so repeated
            # curate_corpus calls do not accumulate cached blocks
            if cache:
                while prev_cached:
                    prev_cached.pop().unpersist()
                prev_cached.append(frame)
        return frame

    note("input", df, cache=False)   # caller's frame: count only

    exact = note("after_exact_dedup",
                 distinct_by_content(df, id_col=id_col, text_col=text_col))
    if not report:
        # ``report=True`` persists each stage, so downstream consumers hit
        # the cache; with ``report=False`` nothing is cached and ``exact``
        # (a full aggregation + semi-join) would be re-evaluated THREE
        # times — under the minhash candidate pipeline, under the packing
        # pass, and under the final join probe.  A lazy localCheckpoint
        # materializes it once on first use (spillable executor blocks,
        # reclaimed by the ContextCleaner — the same lineage-truncation
        # mechanism the CC fixpoint already uses) without changing any
        # value.
        exact = exact.localCheckpoint(eager=False)

    # num_hashes/bands pass through to the LSH stage: the default 64x16
    # (4 rows/band) is recall-safe down to low thresholds; at production
    # thresholds >= 0.7 pass 128/16 (8 rows/band, the bench operating
    # point) — it admits far fewer false candidates, which is where the
    # rescoring time goes on boilerplate-heavy corpora
    pairs = near_duplicates_minhash(exact, id_col=id_col, text_col=text_col,
                                    threshold=jaccard_threshold,
                                    num_hashes=num_hashes, bands=bands)
    near = note("after_near_dedup",
                resolve_duplicates(exact, pairs, id_col=id_col))

    scored = quality_score(
        lang_id(near, text_col=text_col), text_col=text_col)
    # drop the scoring helper columns (hits_*, punct_ratio, ...) but keep
    # n_tokens: quality_features already computed it with token_count_ws,
    # so the packer reuses it instead of re-tokenizing
    base_cols = [c for c in df.columns
                 if c not in ("pred_lang", "quality_score", "n_tokens")]
    kept = note("after_quality_lang_gate", scored.where(
        F.col("pred_lang").isin(*languages)
        & (F.col("quality_score") >= F.lit(min_quality)))
        .select(*base_cols, "pred_lang", "quality_score", "n_tokens"))
    if not report:
        # same reasoning as ``exact``: the gate subtree otherwise runs
        # twice (slim pack pass + join probe)
        kept = kept.localCheckpoint(eager=False)

    toks = hash_split(kept, id_col, weights)
    # ONE slim packing pass for all splits: pack_rows' split-boundary
    # reset keeps bins split-pure without a per-split pass, so the
    # dedup/gate subtree appears twice in the final plan (slim pack +
    # join probe) instead of once per split plus the probe.  Measured
    # choices behind this shape (sf1.0, interleaved best-of-3): packing
    # the FULL rows would collapse the subtree to one evaluation but
    # round-trips every text column through Arrow — 20.8 s vs 17.2 s
    # for the old per-split form; the slim hybrid wins both locally
    # (15.1 s) and at scale (one fewer full-corpus evaluation, and the
    # Arrow kernel only ever sees id/split/token ints).
    # pack_partitions pins the layout: the same value on any cluster
    # size reproduces the same bins (namespaced by partition id).
    packed = pack_rows(toks.select(id_col, "split", "n_tokens"),
                       id_col=id_col, tokens_col="n_tokens",
                       max_tokens=max_tokens,
                       num_partitions=pack_partitions,
                       split_col="split").select(id_col, "bin_id")
    out = note("output", toks.join(packed, id_col))
    return out, audit
