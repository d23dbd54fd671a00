"""End-to-end image-table validation job (the engine's flagship pipeline).

One pass over the image+caption table produces:

1. row-level constraint violations from the compiled Catalyst plan
   (uuid/range/enum/length/pattern/required — zero Python),
2. table-level uniqueness violations (two-phase salted aggregation),
3. optional per-row decoded-pixel PSNR + caption-equality invariants and
   stored-phash-vs-decoded-pixels consistency (one Arrow-batched decode
   pass serves both), and
4. per-partition pass/fail verdicts.

Scan discipline (SURVEY.md §4.3 persist-once dual-write): the compiled
constraint projection is evaluated in ONE scan of the input into a slim
persisted intermediate (key, partition, valid, violations — a few bytes per
row, ~1-3% of input width).  Row violations, the uniqueness aggregation,
the uniqueness join-back, AND the per-partition verdicts are all served
from that cache — without it the same input is scanned four times (round-1
shape, measured as the fixed cost that capped end-to-end scaling at 0.46).
The pixel kernel keeps its own scan: it needs the heavy ``bytes`` column,
which must NOT be persisted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.core import CompiledSchema, verdict_aggs, violation_rows
from .. import errors as E
from ..operators import table_checks as tc
from ..operators.multimodal import pixel_caption_invariants
from ..sources.images import IMAGE_STRUCT_SCHEMA


@dataclass
class ImageValidationResult:
    validated: DataFrame       # slim: key + partition + violations + valid
    violations: DataFrame      # (image_id, constraint_id, path, value)
    verdicts: DataFrame        # per-partition pass/fail + counts

    def unpersist(self) -> None:
        self.validated.unpersist()


def validate_images(df: DataFrame, check_pixels: bool = False,
                    psnr_threshold: float = 40.0,
                    pixel_sample_fraction: float = 1.0,
                    schema: dict | None = None,
                    key_col: str = "image_id",
                    persist_intermediate: bool = True,
                    check_exif: bool = False,
                    check_phash: bool = False,
                    phash_tolerance: int = 6,
                    unique_strategy: str = "auto") -> ImageValidationResult:
    """``unique_strategy`` picks how the duplicate-key set joins back onto
    the fact table:

    * ``"probe"`` — ``gated_broadcast``'s counted probe decides statically.
      The probe is an EAGER job at plan-build time; since the slim cache is
      cold at that point, it pays a full constraint pass over the input
      before the real actions run (the fixed stage VERDICT r4 #2 flagged).
    * ``"aqe"`` — no probe: a plain join whose build side AQE converts to
      broadcast at runtime from the dup aggregation's actual shuffle stats
      (and leaves as a shuffle join when the corpus is pathologically
      duplicated — the same OOM guard the probe provides, decided from
      real sizes instead of an extra counting job).
    * ``"auto"`` (default) — ``"aqe"`` when adaptive execution is enabled
      in the session, else ``"probe"``.
    """
    plan = CompiledSchema(schema or IMAGE_STRUCT_SCHEMA, extended=True)
    validated = plan.validate(df)
    unique_strategy = tc.resolve_unique_strategy(df, unique_strategy)

    slim = validated.select(
        key_col,
        F.spark_partition_id().alias("__part"),
        "valid", "violation_count",
        # valid rows store a NULL array instead of one all-NULL cell per
        # constraint (measured ~20% faster cache build at 16M rows; the
        # serialized size is already bitmap-compact either way), and
        # ``violation_rows``' explode skips NULL arrays — those rows
        # contributed no violation rows anyway
        F.when(F.col("violation_count") > 0, F.col("violations"))
        .alias("violations"))
    if persist_intermediate:
        # serialized, spillable: at 10^12 rows this is the difference
        # between one scan of the 100-TB table and four
        slim = slim.persist(StorageLevel.MEMORY_AND_DISK)

    # the canonical explode-then-filter shape, defined once in the compiler
    row_viol = violation_rows(slim, [key_col])

    # uniqueness from the cached slim projection (key column only);
    # eqNullSafe: duplicate_keys groups NULL keys, so the back-join must
    # match them too or NULL-key duplicates silently vanish (the same
    # contract table_checks.unique_violations keeps)
    # plain full-key discovery shuffle, NOT duplicate_keys' hash_prefilter:
    # interleaved A/B at 16M rows measured the prefilter's extra cached
    # pass costing more than its 5x narrower shuffle saves when the
    # "network" is one box's memory bus.  On a real multi-executor cluster
    # the trade reverses (shuffle bytes cross machines); callers there
    # compose duplicate_keys(hash_prefilter=True) directly.
    dups = tc.duplicate_keys(slim.select(key_col), [key_col]) \
        .select(F.col(key_col).alias("__dk"), "cnt")
    if unique_strategy == "probe":
        dups = tc.gated_broadcast(dups, 10_000_000)
    uniq_viol = (slim.select(key_col)
                 .join(dups,
                       F.col(key_col).eqNullSafe(F.col("__dk")))
                 .select(F.col(key_col),
                         F.lit(E.ENGINE_UNIQUE_VIOLATION).alias("constraint_id"),
                         F.lit(f"#/{key_col}").alias("path"),
                         F.col(key_col).cast("string").alias("value")))

    all_viol = row_viol.unionByName(uniq_viol)
    if check_pixels or check_phash or check_exif:
        # the media kernels speak the north-rule column names; a custom
        # key column is presented to them as image_id (and their output
        # keyed back as key_col), so key_col= composes with every check
        if key_col != "image_id" and "image_id" in df.columns:
            raise ValueError(
                f"key_col={key_col!r} with a distinct 'image_id' column is "
                f"ambiguous for the media checks — drop or rename one")
        media_df = (df if key_col == "image_id"
                    else df.withColumnRenamed(key_col, "image_id"))
    if check_pixels or check_phash:
        # phash consistency rides the same decode pass as the PSNR
        # invariant — one scan of the heavy ``bytes`` column either way.
        # In phash-only mode the kernel skips PSNR/caption work but still
        # reports decode failures: an undecodable payload cannot vouch
        # for its stored hash.
        inv = pixel_caption_invariants(
            media_df, psnr_threshold, pixel_sample_fraction,
            check_phash=check_phash, phash_tolerance=phash_tolerance,
            check_pixels=check_pixels)
        all_viol = all_viol.unionByName(
            inv.select(F.col("image_id").alias(key_col),
                       "constraint_id", "path", "value"))
    if check_exif:
        # header-only scan (no pixel decode): declared (w, h) must agree
        # with any embedded EXIF dims, orientation-aware
        from ..operators.multimodal import exif_consistency_violations

        all_viol = all_viol.unionByName(
            exif_consistency_violations(media_df)
            .withColumnRenamed("image_id", key_col))

    verdicts = (slim.groupBy(F.col("__part").alias("partition"))
                .agg(*verdict_aggs())
                .withColumn("passed", F.col("invalid_rows") == F.lit(0)))

    return ImageValidationResult(
        validated=slim,
        violations=all_viol,
        verdicts=verdicts,
    )


def summary(result: ImageValidationResult) -> DataFrame:
    """Violations per constraint id (small; for dashboards/manifest rows)."""
    return (result.violations
            .groupBy("constraint_id")
            .agg(F.count(F.lit(1)).alias("violations"))
            .orderBy("constraint_id"))
