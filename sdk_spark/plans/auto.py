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
        clash = [k for k in key_cols if k in {f.name for f in st.fields}]
        if clash:
            # selecting key cols next to same-named doc fields would
            # produce ambiguous duplicate columns (AnalysisException deep
            # in the plan, with no fallback); the Arrow kernel keys
            # violations by the DataFrame column correctly
            raise SchemaCompileError(
                f"key columns {clash} collide with schema properties")
        typed = df.select(*key_cols,
                          F.from_json(F.col(json_col), st).alias("__doc"),
                          F.col(json_col).alias("__raw"))
        # NULL / malformed / non-object documents must NOT be silently
        # valid (kernel parity: jsonbatch.validate_json_column emits
        # INSTANCE_TYPE_MISMATCH at '#').  ``from_json`` returns an
        # all-null struct (not NULL) for malformed input, so the reliable
        # parse-failure signal is ``json_object_keys(raw) IS NULL`` —
        # null for NULL raw, unparseable text, and any non-object root.
        parse_fail = F.json_object_keys(F.col("__raw")).isNull()
        bad = (typed.where(parse_fail)
               .select(*key_cols,
                       F.lit("INSTANCE_TYPE_MISMATCH").alias("constraint_id"),
                       F.lit("#").alias("path"),
                       F.when(F.trim(F.col("__raw")) == "null", F.lit(None))
                       .otherwise(F.substring(F.col("__raw"), 1, 128))
                       .alias("value")))
        # keys/raw kept out of the validated projection: root-level checks
        # like has/patternProperties iterate DataFrame columns and must not
        # see the carrier columns.  Parse failures are excluded — the
        # kernel stops at the root mismatch and never reports the
        # would-be-missing required properties of an unparsed doc.
        flat = typed.where(~parse_fail).select(*key_cols, *[
            F.col(f"__doc.{f.name}").alias(f.name) for f in st.fields])
        validated = plan.validate(flat)
        viol = violation_rows(validated, key_cols).unionByName(bad)

        # from_json NULLS any field it cannot coerce, and the compiled plan
        # treats NULL as absent — so a present-but-mistyped non-required
        # property would validate silently clean.  Recover kernel parity at
        # the top level: the key LISTED in the document (json_object_keys
        # reports it even for an explicit json null, which the kernel also
        # flags as a type mismatch) while the typed field is NULL => the
        # field existed but did not fit its declared type.  (Mismatches
        # nested inside sub-structs still coerce to null silently — use the
        # Arrow kernel when that distinction matters below the root.)
        def _mism_entry(f):
            raw_f = F.get_json_object(F.col("__raw"), f"$['{f.name}']")
            present = F.array_contains(F.json_object_keys(F.col("__raw")),
                                       f.name)
            return F.when(
                present & F.col(f"__doc.{f.name}").isNull(),
                F.struct(F.lit(f"#/{f.name}").alias("path"),
                         F.coalesce(F.substring(raw_f, 1, 128),
                                    F.lit("null")).alias("value")))
        mism = (typed.where(~parse_fail)
                .select(*key_cols,
                        F.explode(F.array(*[_mism_entry(f)
                                            for f in st.fields])).alias("mv"))
                .where(F.col("mv").isNotNull())
                .select(*key_cols,
                        F.lit("INSTANCE_TYPE_MISMATCH").alias("constraint_id"),
                        F.col("mv.path").alias("path"),
                        F.col("mv.value").alias("value")))
        viol = viol.unionByName(mism)

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


def validate_json_with_instance_uses(df: DataFrame, json_col: str,
                                     schema_doc: dict, key_cols: list[str],
                                     extended: bool = False,
                                     max_distinct_uses: int = 16,
                                     ) -> tuple[DataFrame, str]:
    """Instance-level ``$uses`` on the columnar path (SURVEY §7 risk item).

    The reference lets each INSTANCE enable schema extensions via its own
    ``$uses`` member (reference: instance_validator.py:321-324) — per-row
    schema mutation, which a compiled columnar plan cannot express. Rows in
    a table are near-homogeneous, so the engine compiles ONE plan per
    distinct ``$uses`` set (driver-side distinct over a low-cardinality
    value) and unions the branch results: per-batch semantics, zero
    per-row Python. Falls back to the row kernel when the distinct count
    exceeds ``max_distinct_uses`` (heterogeneity says rows aren't batch-
    shaped) or a branch schema cannot lower.
    """
    uses_expr = F.get_json_object(F.col(json_col), "$['$uses']")
    distinct = [r[0] for r in
                df.select(uses_expr.alias("u")).distinct()
                .limit(max_distinct_uses + 1).collect()]
    if len(distinct) > max_distinct_uses:
        return (validate_json_column(df, json_col, schema_doc,
                                     key_cols=key_cols, extended=extended),
                "arrow")
    import json as _json

    from ..rowcheck import BUILTIN_ADDINS as builtins

    meta = schema_doc.get("$schema", "")
    offers = schema_doc.get("$offers", {})

    def _deref(ptr):
        from ..schema.normalize import deref

        return deref(schema_doc, ptr)

    branches = []
    for u in distinct:
        try:
            uses_list = _json.loads(u) if u else None
        except ValueError:
            # get_json_object strips the quotes from a string-valued
            # $uses, so the raw text IS the single extension name
            # (kernel parity: rowcheck wraps a non-list $uses)
            uses_list = u
        if not isinstance(uses_list, list):
            uses_list = [uses_list] if isinstance(uses_list, str) else []
        branch_schema = dict(schema_doc)
        extra: list[tuple[str, str]] = []  # (constraint_id, value) per row
        if uses_list:
            # built-in keyword families cannot be instance-enabled on a core
            # schema (kernel parity: rowcheck.py:170-178; reference:
            # instance_validator.py:146-160)
            if meta.endswith("/core/v0/#") and any(
                    x in ("JSONStructureValidation",
                          "JSONStructureConditionalComposition")
                    for x in uses_list):
                extra.append(("INSTANCE_ADDIN_NOT_SUPPORTED",
                              _json.dumps(uses_list)))
            declared = dict(branch_schema.get("properties", {}))
            props = dict(declared)
            conflict = False
            for x in uses_list:
                if x in builtins:
                    continue
                if x not in offers:
                    extra.append(("INSTANCE_USES_NOT_OFFERED", str(x)))
                    continue
                addin = offers[x]
                for g in (addin if isinstance(addin, list) else [addin]):
                    node = g
                    if isinstance(g, str):
                        node = _deref(g)
                    elif isinstance(g, dict) and "$ref" in g:
                        node = _deref(g["$ref"])
                    if isinstance(node, dict):
                        for k, v in node.get("properties", {}).items():
                            if k in declared:
                                # add-in property conflicts with a declared
                                # one: the kernel emits the proper finding
                                # (rowcheck._apply_uses) — route this branch
                                # there instead of silently overwriting
                                conflict = True
                            props[k] = v
            branch_schema["properties"] = props
        cond = uses_expr.isNull() if u is None else (uses_expr == F.lit(u))
        subset = df.where(cond)
        try:
            if uses_list and conflict:
                raise SchemaCompileError("add-in property conflict")
            viol, path = validate_json_auto(subset, json_col, branch_schema,
                                            key_cols, extended=extended)
        except SchemaCompileError:
            viol, path = (validate_json_column(subset, json_col,
                                               branch_schema,
                                               key_cols=key_cols,
                                               extended=extended), "arrow")
        for cid, val in extra:
            viol = viol.unionByName(subset.select(
                *key_cols,
                F.lit(cid).alias("constraint_id"),
                F.lit("#").alias("path"),
                F.lit(val).alias("value")))
        branches.append((viol, path))
    if not branches:
        # zero distinct $uses values == zero rows: an empty violations
        # frame with the standard shape, not an IndexError
        empty = df.select(
            *key_cols,
            F.lit(None).cast("string").alias("constraint_id"),
            F.lit(None).cast("string").alias("path"),
            F.lit(None).cast("string").alias("value")).where(F.lit(False))
        return empty, "catalyst"
    out = branches[0][0]
    for viol, _p in branches[1:]:
        out = out.unionByName(viol)
    paths = {p for _v, p in branches}
    mode = paths.pop() if len(paths) == 1 else "mixed"
    return out, mode
