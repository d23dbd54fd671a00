"""End-to-end image-table validation job (the engine's flagship pipeline).

One pass over the image+caption table produces:

1. row-level constraint violations from the compiled Catalyst plan
   (uuid/range/enum/length/pattern/required — zero Python),
2. table-level uniqueness violations (two-phase salted aggregation),
3. optional per-row decoded-pixel PSNR + caption-equality invariants
   (Arrow-batched kernel), and
4. per-partition pass/fail verdicts.

Shuffles: exactly one for uniqueness and one tiny one for verdicts; the
constraint pass itself is shuffle-free (SURVEY.md §4.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.core import CompiledSchema, partition_verdicts, violation_rows
from ..operators import table_checks as tc
from ..operators.multimodal import pixel_caption_invariants
from ..sources.images import IMAGE_STRUCT_SCHEMA


@dataclass
class ImageValidationResult:
    validated: DataFrame       # input + violations + valid
    violations: DataFrame      # (image_id, constraint_id, path, value)
    verdicts: DataFrame        # per-partition pass/fail + counts


def validate_images(df: DataFrame, check_pixels: bool = False,
                    psnr_threshold: float = 40.0,
                    pixel_sample_fraction: float = 1.0,
                    schema: dict | None = None) -> ImageValidationResult:
    plan = CompiledSchema(schema or IMAGE_STRUCT_SCHEMA, extended=True)
    validated = plan.validate(df)

    row_viol = violation_rows(validated, ["image_id"]) \
        .select("image_id", "constraint_id", "path", "value")
    uniq_viol = tc.unique_violations(df, ["image_id"]) \
        .select("image_id", "constraint_id", "path", "value")
    all_viol = row_viol.unionByName(uniq_viol)
    if check_pixels:
        inv = pixel_caption_invariants(df, psnr_threshold, pixel_sample_fraction)
        all_viol = all_viol.unionByName(
            inv.select("image_id", "constraint_id", "path", "value"))

    return ImageValidationResult(
        validated=validated,
        violations=all_viol,
        verdicts=partition_verdicts(validated),
    )


def summary(result: ImageValidationResult) -> DataFrame:
    """Violations per constraint id (small; for dashboards/manifest rows)."""
    return (result.violations
            .groupBy("constraint_id")
            .agg(F.count(F.lit(1)).alias("violations"))
            .orderBy("constraint_id"))
