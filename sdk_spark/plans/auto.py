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

from .. import errors as E
from ..compiler.core import STRING_BACKED, CompiledSchema, violation_rows
from ..operators.jsonbatch import validate_json_column
from ..schema.normalize import SchemaCompileError, effective


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
    # render only schema-REFERENCED columns into the row JSON: key columns
    # and undeclared metadata columns are not part of the document, and
    # feeding them to the kernel fabricates INSTANCE_ADDITIONAL_PROPERTY
    # violations under additionalProperties:false (root scoping parity: the
    # catalyst path's object checks also see declared properties only).
    # "Referenced" is wider than `properties`: names listed in required /
    # dependentRequired must render too, or the kernel reports them missing
    # while the catalyst path binds the real column (r5 review finding).
    # Schemas whose conditionals/patternProperties can reach arbitrary
    # names keep every column — the same every-column fallback the
    # compiler's root scoping uses (compiler/core.py::_cond_prop_names).
    declared: set = set()
    try:
        root = effective(schema_doc, schema_doc)
        if isinstance(root, dict):
            if any(k in root for k in
                   ("allOf", "anyOf", "oneOf", "not", "if",
                    "patternProperties")):
                declared = set()  # unbounded reach: render all columns
            else:
                declared |= set(root.get("properties", {}))
                req = root.get("required")
                if isinstance(req, list):
                    declared |= {x for x in req if isinstance(x, str)}
                dep = root.get("dependentRequired")
                if isinstance(dep, dict):
                    declared |= set(dep)
                    for v in dep.values():
                        if isinstance(v, list):
                            declared |= {x for x in v if isinstance(x, str)}
    except Exception:
        declared = set()
    doc_cols = [c for c in df.columns if c in declared] if declared \
        else list(df.columns)
    row_json = (F.to_json(F.struct(*[df[c] for c in doc_cols]))
                if doc_cols else F.lit("{}"))  # no declared column present
    json_df = df.withColumn("__row_json", row_json)
    viol = validate_json_column(json_df, "__row_json", schema_doc,
                                key_cols=key_cols, extended=extended)
    return viol, "arrow"


#: instance keys exempt from the open-object check at the document root
#: (row kernel parity: sdk_spark.rowcheck._h_object reserved set)
_ROOT_RESERVED = ("$schema", "$uses")

#: carrier columns of the json-auto projection — a schema property (or key
#: column) with one of these names would alias-collide mid-plan
_CARRIERS = ("__doc", "__raw", "__keys", "__var")

#: declared types whose JSON token must be a string (kernel parity:
#: ``_h_string`` and the string-backed ``_h_bigint``/``_h_decimal`` all
#: reject non-string tokens, but ``from_json`` copies any token's text into
#: a StringType field, so the null-coercion probe alone cannot see them)
_STRING_TOKEN_TYPES = frozenset(
    {"string", "date", "datetime", "time", "duration", "uuid", "uri",
     "jsonpointer"}) | frozenset(STRING_BACKED)


def _field_type_info(plan: CompiledSchema, name: str):
    """(simple declared type or None, null-token-is-valid) for a top-level
    property — drives the mismatch probes in ``validate_json_auto``.
    Finding codes for mismatched rows come from the kernel reroute, not
    from here."""
    def _branch_type(x):
        # a union branch may be a {"$ref": ...} dict — resolve it the way
        # the branch compiler does, so a $ref'd string-family type still
        # joins the non-string-token probe (r5 review finding)
        if isinstance(x, str):
            return x
        if isinstance(x, dict):
            try:
                rx = effective(plan.doc, x, max_depth=plan.max_depth)
                t = rx.get("type") if isinstance(rx, dict) else None
                return t if isinstance(t, str) else None
            except Exception:
                return None
        return None

    sub = plan.root.get("properties", {}).get(name)
    if not isinstance(sub, dict):
        return None, True
    node = effective(plan.doc, sub, max_depth=plan.max_depth)
    t = node.get("type")
    if isinstance(t, list):
        allow_null = "null" in [x for x in t if isinstance(x, str)]
        non_null = [_branch_type(x) for x in t if x != "null"]
        if len(non_null) == 1:
            return non_null[0], allow_null
        return None, allow_null  # heterogeneous union: raw text
    if not isinstance(t, str):
        return None, True  # untyped node: kernel accepts any value
    if t in ("null", "any"):
        return t, True
    return t, False


def validate_json_auto(df: DataFrame, json_col: str, schema_doc: dict,
                       key_cols: list[str],
                       extended: bool = True,
                       kernel_schema: dict | None = None,
                       clean_extra: list | None = None,
                       ) -> tuple[DataFrame, str]:
    """Catalyst path for a RAW-JSON column: parse with the compiled struct
    type and validate in one projection. Unlike the typed path — where
    structs are closed by construction — raw JSON can carry properties the
    schema does not declare, so ``additionalProperties: false`` is enforced
    with ``json_object_keys`` against the declared property set (SURVEY
    §2.1 mapping). Rows whose top-level tokens mismatch their declared
    types are rerouted — row-level, not whole-frame — to the Arrow kernel
    for reference-exact mismatch/add-in findings; whole-frame fallback only
    when the schema cannot lower at all.

    ``kernel_schema``: schema handed to the kernel for rerouted rows (the
    $uses wrapper passes the pre-merge original). ``clean_extra``: list of
    (constraint_id, value) findings appended once per NON-rerouted row.
    """
    try:
        plan = CompiledSchema(schema_doc, extended=extended)
        if plan.root.get("type") != "object":
            raise SchemaCompileError("json auto path expects an object root")
        st = plan.struct_type()
        clash = [k for k in list(key_cols) + [f.name for f in st.fields]
                 if k in _CARRIERS]
        clash += [k for k in key_cols if k in {f.name for f in st.fields}]
        # the compiler refuses (ValueError, not SchemaCompileError) inputs
        # that already carry its OUTPUT columns — a schema property named
        # 'valid'/'violations'/'violation_count' must route to the row
        # kernel instead of crashing the whole validate (r5 review finding)
        clash += [f.name for f in st.fields
                  if f.name in ("valid", "violations", "violation_count")]
        if clash:
            # selecting key cols next to same-named doc fields (or either
            # next to a carrier column) would produce ambiguous duplicate
            # columns (AnalysisException deep in the plan, with no
            # fallback); the Arrow kernel keys violations by the DataFrame
            # column correctly
            raise SchemaCompileError(
                f"key columns {clash} collide with schema properties")
        unsafe = [f.name for f in st.fields
                  if not f.name or f.name != f.name.strip()
                  or any(ch in f.name for ch in ".`'\"[]")]
        if unsafe:
            # names that break dotted column refs or JSONPath quoting would
            # surface as AnalysisException at select time (which the
            # fallback below cannot catch); the row kernel handles any
            # property name
            raise SchemaCompileError(
                f"property names {unsafe} need the row kernel")
        info = {f.name: _field_type_info(plan, f.name) for f in st.fields}
        probe = {f.name for f in st.fields
                 if info[f.name][0] in _STRING_TOKEN_TYPES}
        # __var is parsed ONCE per row; all per-field token probes are
        # variant gets on the parsed binary (no re-parse per field, unlike
        # a get_json_object per nullable property — r5 review finding)
        typed = df.select(
            *key_cols,
            F.from_json(F.col(json_col), st).alias("__doc"),
            F.col(json_col).alias("__raw"),
            F.json_object_keys(F.col(json_col)).alias("__keys"),
            F.try_parse_json(F.col(json_col)).alias("__var"))
        # NULL / malformed / non-object documents must NOT be silently
        # valid (kernel parity: jsonbatch.validate_json_column emits
        # INSTANCE_TYPE_MISMATCH at '#').  ``from_json`` returns an
        # all-null struct (not NULL) for malformed input, so the reliable
        # parse-failure signal is ``json_object_keys(raw) IS NULL`` —
        # null for NULL raw, unparseable text, and any non-object root.
        parse_fail = F.col("__keys").isNull()
        bad = (typed.where(parse_fail)
               .select(*key_cols,
                       F.lit("INSTANCE_TYPE_MISMATCH").alias("constraint_id"),
                       F.lit("#").alias("path"),
                       F.when(F.trim(F.col("__raw")) == "null", F.lit(None))
                       .otherwise(F.substring(F.col("__raw"), 1, 128))
                       .alias("value")))

        def _vtype(name):
            return F.schema_of_variant(
                F.try_variant_get(F.col("__var"), f"$['{name}']", "variant"))

        def _bad_token(name):
            # string-family declared type, non-string non-null JSON token:
            # from_json copied the token's TEXT into the StringType field,
            # so the value is non-null and the coercion probe is blind
            present = F.array_contains(F.col("__keys"), name)
            vt = _vtype(name)
            return present & vt.isNotNull() & ~vt.isin("STRING", "VOID")

        # from_json NULLS any field it cannot coerce, and the compiled plan
        # treats NULL as absent — so a present-but-mistyped property would
        # either validate silently clean or fire the compiled value checks
        # on from_json's TEXT coercion, neither of which is what the kernel
        # (and the reference validator it differentially tracks) does:
        # mistyped tokens produce type-specific findings AND each
        # validation add-in has its own cannot-evaluate semantics
        # (reference: instance_validator.py:828-1047 — e.g. `pattern` on a
        # non-string raises inside re.search and reports, `minLength` on an
        # array token evaluates len()).  Emulating that matrix statically
        # in Catalyst is fragile, so rows carrying ANY top-level mismatch
        # are REROUTED to the Arrow row kernel — exact parity by
        # construction — while clean rows (the overwhelming majority at
        # scale: violations are the tail) stay on the compiled one-pass
        # plan.  Mismatch detection per field: (a) the key is LISTED in the
        # document while the typed field coerced to NULL (exempting an
        # explicit JSON null when the declared type admits null); (b) for
        # string-family fields, a non-string token via the variant type
        # (``_bad_token`` — text coercion blinds probe (a)).  Mismatches
        # nested inside a well-formed sub-struct still coerce to null
        # silently — use the kernel when that matters below the root.
        required = {x for x in (plan.root.get("required") or [])
                    if isinstance(x, str)}

        def _mism_cond(f):
            present = F.array_contains(F.col("__keys"), f.name)
            _t, allow_null = info[f.name]
            cond = present & F.col(f"__doc.{f.name}").isNull()
            vt = _vtype(f.name)
            if allow_null:
                # an explicit JSON null (variant type VOID; presence is
                # established separately) is admitted by this field's type
                # — only a non-null uncoercible token mismatches
                cond = cond & vt.isNotNull() & (vt != "VOID")
                if f.name in required:
                    # kernel required sees `"k" in value`: an explicitly-
                    # null REQUIRED field is present there but NULL to the
                    # compiled plan (which would report it missing) — the
                    # kernel computes the exact findings.  eqNullSafe: vt
                    # is NULL for an ABSENT field, and a bare == would
                    # poison the whole reroute OR-chain with SQL NULL,
                    # dropping the row from BOTH branches
                    cond = cond | vt.eqNullSafe(F.lit("VOID"))
            if f.name in probe:
                cond = cond | _bad_token(f.name)
            return cond
        reroute = F.lit(False)
        for f in st.fields:
            reroute = reroute | _mism_cond(f)
        # a doc whose object keys parse but whose VARIANT parse fails
        # (duplicate JSON keys — try_parse_json is stricter than
        # json_object_keys/from_json) blinds every token probe above; the
        # kernel's json.loads applies last-wins exactly like from_json
        # cannot be assumed to, so those rows go to the kernel wholesale
        reroute = ~parse_fail & (reroute | F.col("__var").isNull())
        clean = typed.where(~parse_fail & ~reroute)

        # keys/raw/var kept out of the validated projection: root-level
        # checks like has/patternProperties/conditionals may iterate ALL
        # DataFrame columns (the compiler's every-column fallback) and
        # must not see the carrier columns.  Parse failures are excluded —
        # the kernel stops at the root mismatch and never reports the
        # would-be-missing required properties of an unparsed doc.
        flat = clean.select(*key_cols,
                            *[F.col(f"__doc.{f.name}").alias(f.name)
                              for f in st.fields])
        validated = plan.validate(flat)
        viol = violation_rows(validated, key_cols).unionByName(bad)

        # the rerouted tail: kernel findings are complete for these rows
        # (type mismatch, add-in cannot-evaluate, required, root open-object
        # check), so every other branch here must exclude them.
        # ``kernel_schema`` lets the $uses wrapper hand the kernel the
        # ORIGINAL schema (the kernel re-derives $uses per row; a pre-merged
        # branch schema would make add-in properties look already-declared)
        dirty = typed.where(reroute).select(*key_cols, F.col("__raw"))
        viol = viol.unionByName(
            validate_json_column(dirty, "__raw",
                                 kernel_schema or schema_doc,
                                 key_cols=key_cols, extended=extended))

        # per-row findings the caller pre-computed for this frame's rows
        # (the $uses wrapper's offer/conflict findings): clean rows only —
        # the kernel emits its own for the rerouted tail
        for cid, val in (clean_extra or []):
            viol = viol.unionByName(clean.select(
                *key_cols,
                F.lit(cid).alias("constraint_id"),
                F.lit("#").alias("path"),
                F.lit(val).cast("string").alias("value")))

        if plan.root.get("additionalProperties") is False:
            declared = list(plan.root.get("properties", {})) + list(_ROOT_RESERVED)
            extra = F.array_except(
                F.col("__keys"),
                F.array(*[F.lit(k) for k in declared]))
            extra_viol = (clean
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


def _parse_uses(u: str | None, vt: str | None):
    """Mirror ``rowcheck._apply_uses``'s wrap rules for one distinct
    ``$uses`` rendering.  ``u`` is the ``get_json_object`` text (quotes
    stripped from strings) and ``vt`` the variant type of the raw token —
    the pair disambiguates a string-valued ``$uses`` whose text happens to
    parse as JSON ('"123"', '"true"') from the actual scalar."""
    import json as _json

    if u is None or vt is None or vt == "VOID":
        return []  # absent or explicit-null $uses: kernel treats as unset
    if vt == "STRING":
        return [u] if u else []  # kernel: falsy $uses is unset
    val = _json.loads(u)
    if isinstance(val, list):
        return val
    return [val] if val else []


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
    distinct ``$uses`` value (driver-side distinct over a low-cardinality
    rendering) and unions the branch results: per-batch semantics, zero
    per-row Python. Falls back to the row kernel when the distinct count
    exceeds ``max_distinct_uses`` (heterogeneity says rows aren't batch-
    shaped) or a branch schema cannot lower — and a kernel branch always
    receives the ORIGINAL schema (the kernel re-derives ``$uses`` per row;
    handing it a pre-merged branch schema would make every add-in property
    look already-declared, fabricating conflict findings) with the
    wrapper's own extra rows suppressed (the kernel emits its own).
    """
    uses_expr = F.get_json_object(F.col(json_col), "$['$uses']")
    vt_expr = F.schema_of_variant(F.try_variant_get(
        F.try_parse_json(F.col(json_col)), "$['$uses']", "variant"))
    distinct = [(r[0], r[1]) for r in
                df.select(uses_expr.alias("u"), vt_expr.alias("vt"))
                .distinct().limit(max_distinct_uses + 1).collect()]
    if len(distinct) > max_distinct_uses:
        return (validate_json_column(df, json_col, schema_doc,
                                     key_cols=key_cols, extended=extended),
                "arrow")
    import json as _json

    from ..rowcheck import BUILTIN_ADDINS as builtins
    from ..rowcheck import META_CORE

    meta = schema_doc.get("$schema", "")
    offers = schema_doc.get("$offers", {})

    def _deref(ptr):
        from ..schema.normalize import deref

        return deref(schema_doc, ptr)

    branches = []
    for u, vt in distinct:
        cond = uses_expr.eqNullSafe(F.lit(u)) & vt_expr.eqNullSafe(F.lit(vt))
        subset = df.where(cond)
        if u is not None and vt is None:
            # the $uses text extracted but the VARIANT parse failed
            # (duplicate JSON keys — try_parse_json is stricter): the
            # wrapper cannot classify these docs batch-side; the kernel
            # re-derives $uses per row from its own json.loads
            branches.append((validate_json_column(
                subset, json_col, schema_doc,
                key_cols=key_cols, extended=extended), "arrow"))
            continue
        uses_list = _parse_uses(u, vt)
        branch_schema = dict(schema_doc)
        extra: list[tuple[str, str | None]] = []  # (constraint_id, value)
        if uses_list:
            # built-in keyword families cannot be instance-enabled on a core
            # schema (kernel parity: rowcheck.py:176 tests EXACT equality
            # with META_CORE, not a suffix; reference:
            # instance_validator.py:146-160)
            if meta == META_CORE and any(
                    x in ("JSONStructureValidation",
                          "JSONStructureConditionalComposition")
                    for x in uses_list):
                extra.append((E.INSTANCE_ADDIN_NOT_SUPPORTED,
                              _json.dumps(uses_list)))
            props = dict(branch_schema.get("properties", {}))
            for x in uses_list:
                if not isinstance(x, str):
                    # unhashable members ({"a": 1}) crash the set/dict
                    # membership tests below; kernel parity (rowcheck.
                    # _apply_uses): report not-offered and continue
                    extra.append((E.INSTANCE_USES_NOT_OFFERED,
                                  _json.dumps(x, default=str)))
                    continue
                if x in builtins:
                    continue
                if x not in offers:
                    # kernel value rendering parity: Finding json.dumps()es
                    # the offending value (None stays NULL)
                    extra.append((E.INSTANCE_USES_NOT_OFFERED,
                                  None if x is None
                                  else _json.dumps(x, default=str)))
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
                            if k in props:
                                # add-in property conflicts with a declared
                                # OR previously-merged one: kernel parity
                                # (rowcheck._apply_uses) is a per-row
                                # finding and last-wins merge — NOT a
                                # compile failure
                                extra.append((
                                    E.INSTANCE_USES_NOT_OFFERED,
                                    _json.dumps(
                                        f"add-in property '{k}' conflicts")))
                            props[k] = v
            branch_schema["properties"] = props
        try:
            # rerouted mismatch rows inside the branch get the ORIGINAL
            # schema (kernel_schema) and the kernel's own $uses findings;
            # the wrapper's pre-computed extras apply to clean rows only
            # (clean_extra) — both double-count otherwise
            viol, path = validate_json_auto(subset, json_col, branch_schema,
                                            key_cols, extended=extended,
                                            kernel_schema=schema_doc,
                                            clean_extra=extra)
            if path != "catalyst":
                raise SchemaCompileError("branch lowered to the kernel")
        except SchemaCompileError:
            # whole-branch kernel fallback: the kernel re-derives $uses and
            # emits its own findings per row
            viol, path = (validate_json_column(subset, json_col,
                                               schema_doc,
                                               key_cols=key_cols,
                                               extended=extended), "arrow")
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
