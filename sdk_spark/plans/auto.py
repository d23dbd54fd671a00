"""Unified validation entry: Catalyst fast path with Arrow fallback.

``validate_auto`` compiles the schema to Column predicates when every
keyword is statically expressible for the DataFrame's types; schemas the
typed compiler cannot lower (runtime type dispatch over heterogeneous
unions, recursion past the depth cap, selector-based inline choice over
untyped data, Python-only regex constructs) fall back to the Arrow-batched
row kernel over a JSON rendering of the row — same violation-row output
either way, so callers never branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.core import CompiledSchema, violation_rows
from ..operators.jsonbatch import validate_json_column
from ..schema.normalize import SchemaCompileError


def validate_auto(df: DataFrame, schema_doc: dict, key_cols: list[str],
                  extended: bool = True) -> tuple[DataFrame, str]:
    """Violation rows via the best available engine path.

    Returns (violations_df, path) where path is 'catalyst' or 'arrow'.
    """
    try:
        plan = CompiledSchema(schema_doc, extended=extended)
        validated = plan.validate(df)
        return violation_rows(validated, key_cols), "catalyst"
    except SchemaCompileError:
        pass
    json_df = df.withColumn(
        "__row_json", F.to_json(F.struct(*[df[c] for c in df.columns])))
    viol = validate_json_column(json_df, "__row_json", schema_doc,
                                key_cols=key_cols, extended=extended)
    return viol, "arrow"
