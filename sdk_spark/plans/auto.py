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


#: instance keys exempt from the open-object check at the document root
#: (row kernel parity: sdk_spark.rowcheck._h_object reserved set)
_ROOT_RESERVED = ("$schema", "$uses")


def validate_json_auto(df: DataFrame, json_col: str, schema_doc: dict,
                       key_cols: list[str],
                       extended: bool = True) -> tuple[DataFrame, str]:
    """Catalyst path for a RAW-JSON column: parse with the compiled struct
    type and validate in one projection. Unlike the typed path — where
    structs are closed by construction — raw JSON can carry properties the
    schema does not declare, so ``additionalProperties: false`` is enforced
    with ``json_object_keys`` against the declared property set (SURVEY
    §2.1 mapping). Falls back to the Arrow row kernel when the schema
    cannot lower.
    """
    try:
        plan = CompiledSchema(schema_doc, extended=extended)
        if plan.root.get("type") != "object":
            raise SchemaCompileError("json auto path expects an object root")
        st = plan.struct_type()
        typed = df.select(*key_cols,
                          F.from_json(F.col(json_col), st).alias("__doc"),
                          F.col(json_col).alias("__raw"))
        # keys/raw kept out of the validated projection: root-level checks
        # like has/patternProperties iterate DataFrame columns and must not
        # see the carrier columns
        flat = typed.select(*key_cols, *[
            F.col(f"__doc.{f.name}").alias(f.name) for f in st.fields])
        validated = plan.validate(flat)
        viol = violation_rows(validated, key_cols)

        if plan.root.get("additionalProperties") is False:
            declared = list(plan.root.get("properties", {})) + list(_ROOT_RESERVED)
            extra = F.array_except(
                F.json_object_keys(F.col("__raw")),
                F.array(*[F.lit(k) for k in declared]))
            extra_viol = (typed
                          .select(*key_cols, F.explode(extra).alias("__k"))
                          .select(*key_cols,
                                  F.lit("INSTANCE_ADDITIONAL_PROPERTY")
                                  .alias("constraint_id"),
                                  F.concat(F.lit("#/"), F.col("__k")).alias("path"),
                                  F.col("__k").alias("value")))
            viol = viol.unionByName(extra_viol)
        return viol, "catalyst"
    except SchemaCompileError:
        pass
    viol = validate_json_column(df, json_col, schema_doc,
                                key_cols=key_cols, extended=extended)
    return viol, "arrow"
