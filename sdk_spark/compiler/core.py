"""Schema → Catalyst compiler.

Lowers a JSON Structure schema to Spark ``Column`` predicates: every schema
keyword becomes a null-safe boolean expression over typed DataFrame columns,
evaluated in ONE projection (single whole-stage-codegen pass over the scan,
no Python in the row path).  The per-instance error list of the reference
validator (reference: python/src/json_structure/instance_validator.py:105-644)
becomes a ``violations`` array column; exploding it yields violation rows
``(row key, constraint id, json path, offending value)`` and aggregating it
yields per-partition verdicts.

Design rules (SURVEY.md §4.2):

* **Null-safety** — in the reference a type mismatch IS an error; in SQL a
  NULL comparison silently drops the row.  Every compiled predicate is
  wrapped ``CASE WHEN col IS NULL THEN <absent-ok> ELSE coalesce(pred, false)``
  so three-valued logic can never swallow a violation.
* **Absent ≡ NULL** — JSON property absence maps to a NULL column; a NULL
  value passes all value-level checks and only ``required`` fails it.
* **Compile-time graph ops** — ``$ref``/``$extends``/``$root``/``$import``
  are resolved once on the driver (``sdk_spark.schema.normalize``); the
  executors only ever see literal-bearing Column trees.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import errors as E
from ..functions.regex_dialect import java_safe, python_compile, python_regex_match
from ..rowcheck import RowChecker
from ..schema.normalize import (
    SchemaCompileError,
    deref,
    detect_extensions,
    effective,
    import_defs,
)

# ---------------------------------------------------------------------------
# constants shared with the row kernel

RX = {
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "datetime": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+\-]\d{2}:\d{2})$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?$",
    "duration": r"^P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$|^P\d+W$",
    "jsonpointer": r"^#(/[^/]+)*$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uri": r"^[a-zA-Z][a-zA-Z0-9+\-.]*:",
    "int": r"^[+-]?[0-9]+$",
    "email": r"^[^@]+@[^@]+\.[^@]+$",
    "ipv4": r"^(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}$",
    "ipv6": r"^[0-9a-fA-F:]+$",
    "hostname": r"^[a-zA-Z0-9.-]+$",
}

SMALL_INT_RANGES = {
    "int8": (-(2**7), 2**7 - 1),
    "uint8": (0, 2**8 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "uint16": (0, 2**16 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "integer": (-(2**31), 2**31 - 1),
    "uint32": (0, 2**32 - 1),
}
BIG_INT_BOUNDS = {
    "int64": ("-9223372036854775808", "9223372036854775807"),
    "uint64": ("0", "18446744073709551615"),
    "int128": ("-170141183460469231731687303715884105728",
               "170141183460469231731687303715884105727"),
    "uint128": ("0", "340282366920938463463374607431768211455"),
}
NUMERIC_TYPES = {
    "number", "integer", "float", "double", "decimal", "float8",
    "int8", "uint8", "int16", "uint16", "int32", "uint32",
    "int64", "uint64", "int128", "uint128",
}
STRING_BACKED = {"int64", "uint64", "int128", "uint128", "decimal"}
CONDITIONAL_KEYWORDS = ("allOf", "anyOf", "oneOf", "not", "if", "then", "else")

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


@dataclass(frozen=True)
class Constraint:
    """One compiled constraint bound to a DataFrame column expression."""

    cid: str          # standardized constraint code (sdk_spark.errors)
    path: str         # JSON pointer into the row, e.g. "#/caption"
    ok: Column        # non-null boolean; False => violation
    value: Column     # offending value rendered as string


@dataclass(frozen=True)
class Ctx:
    validation: bool
    conditionals: bool
    #: True while compiling inside a higher-order-function lambda (array
    #: items, map values/keys, contains). Arrow/pandas fallback expressions
    #: cannot reference HOF lambda variables, so python-dialect regexes in
    #: these contexts must escalate to a SchemaCompileError (the auto plan
    #: then routes the whole schema through the row kernel).
    in_lambda: bool = False

    def with_node(self, node: dict) -> "Ctx":
        uses = node.get("$uses")
        if not isinstance(uses, list):
            return self
        return Ctx(
            validation=self.validation or "JSONStructureValidation" in uses,
            conditionals=self.conditionals or "JSONStructureConditionalComposition" in uses,
            in_lambda=self.in_lambda,
        )

    def lambda_ctx(self) -> "Ctx":
        return Ctx(self.validation, self.conditionals, True)


def _compile_or_raise(pat: str, where: str) -> "re.Pattern":
    """patternProperties regexes compile at plan-build time; an invalid
    one must surface as SchemaCompileError (so ``validate_auto`` reroutes
    to the row kernel) — a bare ``re.error`` escaped that contract
    (r5 review finding; the string ``pattern`` keyword already wraps)."""
    try:
        return re.compile(pat)
    except re.error as exc:
        raise SchemaCompileError(
            f"invalid regex {pat!r} at {where}: {exc}") from exc


def _present(col: Column, pred: Column) -> Column:
    """Null-safe wrap: NULL value => constraint passes (absence is handled
    by ``required``); non-null => pred with NULL coerced to False."""
    return F.when(col.isNull(), F.lit(True)).otherwise(F.coalesce(pred, F.lit(False)))


def _render(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(col)
    if isinstance(dt, T.BinaryType):
        return F.base64(col)
    return col.cast("string")


def _is_atomic(dt: T.DataType) -> bool:
    return not isinstance(dt, (T.StructType, T.ArrayType, T.MapType))


class CompiledSchema:
    """A JSON Structure schema compiled against Spark's type system.

    Usage::

        plan = CompiledSchema(schema_doc, extended=True)
        validated = plan.validate(df)          # + violations, valid columns
        bad = violation_rows(validated, ["image_id"])
        per_part = partition_verdicts(validated)
    """

    def __init__(self, doc: dict, extended: bool = False,
                 external_schemas: list[dict] | None = None,
                 max_depth: int = 64):
        if external_schemas:
            doc = import_defs(doc, {s["$id"]: s for s in external_schemas
                                    if isinstance(s, dict) and "$id" in s})
        elif isinstance(doc, dict) and _has_imports(doc):
            doc = import_defs(doc, {})
        self.doc = doc
        self.extended = extended
        self.max_depth = max_depth
        uri = doc.get("$schema", "") if isinstance(doc, dict) else ""
        self.is_extended_meta = uri.endswith("/extended/v0/#")
        exts = detect_extensions(doc, extended)
        self.ctx = Ctx(
            validation="JSONStructureValidation" in exts,
            conditionals="JSONStructureConditionalComposition" in exts,
        )
        self.root = effective(doc, doc, max_depth=max_depth)

    # -- Spark schema inference -------------------------------------------------
    def struct_type(self) -> T.StructType:
        """Expected DataFrame schema: object roots map properties to columns,
        scalar/compound roots map the whole instance to a ``value`` column."""
        node = self.root
        if node.get("type") == "object":
            return self._object_struct(node)
        return T.StructType([T.StructField("value", self.spark_type(node), True)])

    def _object_struct(self, node: dict) -> T.StructType:
        fields = []
        for name, sub in node.get("properties", {}).items():
            fields.append(T.StructField(
                name, self.spark_type(effective(self.doc, sub, max_depth=self.max_depth)),
                True))
        return T.StructType(fields)

    def spark_type(self, node: dict, depth: int = 0) -> T.DataType:
        if depth > self.max_depth:
            raise SchemaCompileError("schema too deep for typed mapping")
        node = effective(self.doc, node, max_depth=self.max_depth)
        t = node.get("type")
        if isinstance(t, list):
            non_null = [x for x in t if x != "null"]
            if len(non_null) == 1 and isinstance(non_null[0], str):
                return self.spark_type({"type": non_null[0]}, depth + 1)
            if len(non_null) == 1 and isinstance(non_null[0], dict):
                return self.spark_type(non_null[0], depth + 1)
            return T.StringType()  # heterogeneous union: keep JSON text
        if not isinstance(t, str):
            return T.StringType()
        if t in ("string", "date", "datetime", "time", "duration", "uuid",
                 "uri", "jsonpointer", "null", "any"):
            return T.StringType()
        if t in STRING_BACKED:
            return T.StringType()
        if t in ("number", "float", "double", "float8"):
            return T.DoubleType()
        if t in SMALL_INT_RANGES:
            return T.LongType()
        if t == "boolean":
            return T.BooleanType()
        if t == "binary":
            return T.BinaryType()
        if t == "object":
            return self._object_struct(node)
        if t in ("array", "set"):
            items = node.get("items") or {"type": "any"}
            return T.ArrayType(self.spark_type(items, depth + 1), True)
        if t == "map":
            values = node.get("values") or {"type": "any"}
            return T.MapType(T.StringType(), self.spark_type(values, depth + 1), True)
        if t == "tuple":
            props = node.get("properties", {})
            order = node.get("tuple", [])
            return T.StructType([
                T.StructField(n, self.spark_type(props[n], depth + 1), True)
                for n in order if n in props])
        if t == "choice":
            return T.StructType([
                T.StructField(n, self.spark_type(sub, depth + 1), True)
                for n, sub in node.get("choices", {}).items()])
        raise SchemaCompileError(f"unsupported type '{t}' for typed mapping")

    # -- binding to a DataFrame -----------------------------------------------
    def constraints(self, df: DataFrame) -> list[Constraint]:
        node = self.root
        ctx = self.ctx.with_node(node)
        if node.get("type") == "object":
            return self._object_constraints_toplevel(df, node, ctx)
        dt = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
        if "value" not in dt:
            raise SchemaCompileError("scalar-root schema expects a 'value' column")
        col = df["value"]
        out = [Constraint(E.INSTANCE_TYPE_MISMATCH, "#",
                          _root_null_ok(node, col), _render(col, dt["value"]))]
        out.extend(self._node(node, "#", col, dt["value"], ctx, 0))
        return out

    def _object_constraints_toplevel(self, df: DataFrame, node: dict,
                                     ctx: Ctx) -> list[Constraint]:
        """Top-level object: DataFrame columns ARE the properties, so child
        expressions bind straight to scan columns (keeps pushdown/pruning)."""
        out: list[Constraint] = []
        schema_by_name = {f.name: f.dataType for f in df.schema.fields}
        props = node.get("properties", {})
        for r in node.get("required", []) or []:
            if r in schema_by_name:
                out.append(Constraint(E.INSTANCE_REQUIRED_PROPERTY_MISSING,
                                      f"#/{r}", df[r].isNotNull(), F.lit(None).cast("string")))
            else:
                out.append(Constraint(E.INSTANCE_REQUIRED_PROPERTY_MISSING,
                                      f"#/{r}", F.lit(False), F.lit(None).cast("string")))
        for name, sub in props.items():
            if name not in schema_by_name:
                continue  # absent column == always-absent property
            out.extend(self._node(sub, f"#/{name}", df[name],
                                  schema_by_name[name], ctx, 1))
        if "has" in node:
            # root scoping: like propertyNames/minProperties below, 'has'
            # looks at DECLARED properties only — an undeclared metadata
            # column (case id, partition key) must not satisfy it
            # (r5 review finding; same divergence rationale)
            has_ok = F.lit(False)
            for name, fdt in schema_by_name.items():
                if name not in props:
                    continue
                try:
                    has_ok = has_ok | (df[name].isNotNull()
                                       & self._valid(node["has"], df[name], fdt,
                                                     ctx, 1))
                except SchemaCompileError:
                    continue
            out.append(Constraint(E.INSTANCE_HAS_NO_MATCH, "#",
                                  F.coalesce(has_ok, F.lit(False)),
                                  F.lit(None).cast("string")))
        if ctx.validation:
            if isinstance(node.get("patternProperties"), dict):
                for pat, sub in node["patternProperties"].items():
                    rx = _compile_or_raise(pat, "#/patternProperties")
                    for name, fdt in schema_by_name.items():
                        # declared-only at root (same scoping as above)
                        if name in props and rx.search(name):
                            out.extend(self._node(sub, f"#/{name}", df[name],
                                                  fdt, ctx, 1))
            if isinstance(node.get("propertyNames"), dict):
                # INTENTIONAL root/nested divergence: at root, undeclared
                # DataFrame columns are out-of-instance metadata (case ids,
                # key columns, partition columns — every real table has
                # them), so propertyNames/minProperties see DECLARED
                # properties only.  A nested struct is fully instance-typed,
                # so _object checks every field.  Pinned by
                # test_review_fixes_r4c::test_toplevel_scopes_to_declared.
                checker = RowChecker(node["propertyNames"], extended=True)
                for name in schema_by_name:
                    if name in props and not checker.is_valid(name):
                        out.append(Constraint(E.INSTANCE_PROPERTY_NAME_INVALID,
                                              f"#/{name}", F.lit(False),
                                              F.lit(name)))
        if ctx.validation:
            present = [F.col(n).isNotNull().cast("int") for n in schema_by_name
                       if n in props] or [F.lit(0)]
            nprops = reduce(lambda a, b: a + b, present)
            if "minProperties" in node:
                out.append(Constraint(E.INSTANCE_MIN_PROPERTIES, "#",
                                      nprops >= F.lit(node["minProperties"]),
                                      nprops.cast("string")))
            if "maxProperties" in node:
                out.append(Constraint(E.INSTANCE_MAX_PROPERTIES, "#",
                                      nprops <= F.lit(node["maxProperties"]),
                                      nprops.cast("string")))
            if isinstance(node.get("dependentRequired"), dict):
                for trig, deps in node["dependentRequired"].items():
                    if trig not in schema_by_name or not isinstance(deps, list):
                        continue
                    for d in deps:
                        dep_ok = (df[d].isNotNull() if d in schema_by_name
                                  else F.lit(False))
                        out.append(Constraint(
                            E.INSTANCE_DEPENDENT_REQUIRED, f"#/{trig}",
                            F.when(df[trig].isNull(), F.lit(True)).otherwise(dep_ok),
                            F.lit(f"{trig} -> {d}")))
        if ctx.conditionals:
            out.extend(self._conditionals_toplevel(df, node, ctx))
        return out

    def _conditionals_toplevel(self, df, node, ctx):
        """Root-level conditionals over an object row: bind subschema
        predicates against a struct of the row's DECLARED property columns
        — the same root scoping as propertyNames/minProperties/has above;
        undeclared metadata columns (case ids, key columns) must not leak
        into branch-level object checks like maxProperties or
        propertyNames (r5 review finding)."""
        if not any(k in node for k in CONDITIONAL_KEYWORDS):
            return []
        names = self._cond_prop_names(node)
        fields = (list(df.schema.fields) if names is None
                  else [f for f in df.schema.fields if f.name in names])
        if not fields:
            fields = list(df.schema.fields)
        row = F.struct(*[df[f.name] for f in fields])
        dt = T.StructType(fields)
        return self._conditional_constraints(node, "#", row, dt, ctx, 0)

    def _cond_prop_names(self, node, depth: int = 0) -> "set | None":
        """Every property name the conditional subtree can reference —
        root ``properties`` plus the declared/required/dependent names of
        each branch, with ``$ref``/``$extends`` resolved the same way the
        branch compiler resolves them.  ``None`` means the subtree uses
        name-pattern keywords whose reach cannot be enumerated
        (patternProperties) — the caller then keeps the historical
        every-column struct instead of guessing."""
        if not isinstance(node, dict):
            return set()
        if depth > 8:
            # deeper than the enumeration walks (compile max_depth is 64,
            # so 9+-level conditional nests DO compile): the subtree's
            # reach is unknown — None keeps the historical every-column
            # struct, same as the patternProperties bail-out.  Returning
            # set() here silently dropped deep-branch property names and
            # compiled their checks against a struct missing the column
            # (false violations / false passes — r5 review finding).
            return None
        try:
            node = effective(self.doc, node, max_depth=self.max_depth)
        except Exception:
            return None
        if "patternProperties" in node:
            return None
        names: set = set()
        if isinstance(node.get("properties"), dict):
            names |= set(node["properties"])
        if isinstance(node.get("required"), list):
            names |= {x for x in node["required"] if isinstance(x, str)}
        if isinstance(node.get("dependentRequired"), dict):
            names |= set(node["dependentRequired"])
            for v in node["dependentRequired"].values():
                if isinstance(v, list):
                    names |= {x for x in v if isinstance(x, str)}
        for k in CONDITIONAL_KEYWORDS:
            v = node.get(k)
            if v is None:
                continue
            for b in (v if isinstance(v, list) else [v]):
                s = self._cond_prop_names(b, depth + 1)
                if s is None:
                    return None
                names |= s
        return names

    # -- recursive node compiler -------------------------------------------------
    def _node(self, node: Any, path: str, col: Column, dt: T.DataType,
              ctx: Ctx, depth: int) -> list[Constraint]:
        if depth > self.max_depth:
            raise SchemaCompileError(f"nesting too deep at {path}")
        node = effective(self.doc, node, max_depth=self.max_depth)
        ctx = ctx.with_node(node)
        # extended metaschema: any node-level $uses auto-enables all addins
        # (reference: instance_validator.py:130-144)
        if self.is_extended_meta and isinstance(node.get("$uses"), list):
            ctx = Ctx(validation=True, conditionals=True, in_lambda=ctx.in_lambda)
        t = node.get("type")
        out: list[Constraint] = []

        if isinstance(t, list):
            branches = []
            for alt in t:
                alt_node = {"type": alt} if isinstance(alt, str) else alt
                try:
                    branches.append(self._valid(alt_node, col, dt, ctx, depth + 1))
                except SchemaCompileError:
                    continue  # branch not representable in this column's type
            if not branches:
                raise SchemaCompileError(f"no union branch at {path} fits {dt}")
            any_ok = reduce(lambda a, b: a | b, branches)
            out.append(Constraint(E.INSTANCE_UNION_NO_MATCH, path,
                                  _present(col, any_ok), _render(col, dt)))
        elif isinstance(t, str):
            out.extend(self._typed(node, t, path, col, dt, ctx, depth))
        elif any(k in node for k in CONDITIONAL_KEYWORDS):
            pass  # conditionals-only schema; handled below
        else:
            raise SchemaCompileError(f"schema at {path} has no usable 'type'")

        # extended metaschema: conditional keywords on a node without its
        # own $uses are an error, not silently evaluated
        # (reference: instance_validator.py:619-625)
        gate_failed = False
        if self.is_extended_meta and any(k in node for k in CONDITIONAL_KEYWORDS):
            if not isinstance(node.get("$uses"), list):
                out.append(Constraint(E.INSTANCE_CONDITIONAL_FAILED, path,
                                      F.lit(False), _render(col, dt)))
                gate_failed = True
        if ctx.conditionals and not gate_failed:
            out.extend(self._conditional_constraints(node, path, col, dt, ctx, depth))
        if "const" in node:
            # Non-scalar const/enum values have no Column literal (F.lit on a
            # dict raises an opaque py4j SparkRuntimeException); raise the
            # typed compile error instead so validate_auto reroutes the schema
            # to the Arrow row kernel, which does deep equality.
            if isinstance(node["const"], (dict, list)):
                raise SchemaCompileError(
                    f"non-scalar const at {path} is not Catalyst-expressible")
            out.append(Constraint(E.INSTANCE_CONST_MISMATCH, path,
                                  _present(col, col == F.lit(node["const"])),
                                  _render(col, dt)))
        if "enum" in node:
            if any(isinstance(v, (dict, list)) for v in node["enum"]):
                raise SchemaCompileError(
                    f"non-scalar enum member at {path} is not "
                    f"Catalyst-expressible")
            out.append(Constraint(E.INSTANCE_ENUM_MISMATCH, path,
                                  _present(col, col.isin(*node["enum"])),
                                  _render(col, dt)))
        return out

    # .. single-validity reduction (for lambda/nested contexts) ..................
    def _valid(self, node: Any, col: Column, dt: T.DataType, ctx: Ctx,
               depth: int) -> Column:
        cons = self._node(node, "#", col, dt, ctx, depth)
        if not cons:
            return F.lit(True)
        return reduce(lambda a, b: a & b, [c.ok for c in cons])

    # .. per-type lowering ......................................................
    def _typed(self, node: dict, t: str, path: str, col: Column,
               dt: T.DataType, ctx: Ctx, depth: int) -> list[Constraint]:
        out: list[Constraint] = []
        val = _render(col, dt)

        def add(cid: str, pred: Column) -> None:
            out.append(Constraint(cid, path, _present(col, pred), val))

        if t == "any":
            pass
        elif t in ("string",):
            _require(isinstance(dt, T.StringType), t, dt, path)
        elif t == "boolean":
            _require(isinstance(dt, T.BooleanType), t, dt, path)
        elif t == "null":
            out.append(Constraint(E.INSTANCE_TYPE_MISMATCH, path,
                                  col.isNull(), val))
        elif t in ("number", "float", "double", "float8"):
            _require(isinstance(dt, _INTEGRAL + _FRACTIONAL), t, dt, path)
        elif t in SMALL_INT_RANGES:
            _require(isinstance(dt, _INTEGRAL) or
                     (isinstance(dt, T.DecimalType) and dt.scale == 0), t, dt, path)
            lo, hi = SMALL_INT_RANGES[t]
            if _dtype_can_exceed(dt, lo, hi):
                add(E.INSTANCE_NUMBER_OUT_OF_RANGE, col.between(F.lit(lo), F.lit(hi)))
        elif t in BIG_INT_BOUNDS:
            lo, hi = BIG_INT_BOUNDS[t]
            if isinstance(dt, T.StringType):
                # JSON string encoding (reference: instance_validator.py:372-411)
                add(E.INSTANCE_NUMBER_FORMAT_INVALID, col.rlike(RX["int"]))
                add(E.INSTANCE_NUMBER_OUT_OF_RANGE, _bigint_in_range(col, lo, hi))
            elif isinstance(dt, _INTEGRAL):
                # any int64-or-narrower column fits inside int128/uint128
                # magnitude bounds; only unsigned types need the >= 0 side
                # (a constant-true constraint would still cost a violations
                # cell per row — r5 review finding)
                if t != "int64" and t.startswith("u"):
                    add(E.INSTANCE_NUMBER_OUT_OF_RANGE, col >= F.lit(0))
            elif isinstance(dt, T.DecimalType) and dt.scale == 0:
                # Only check sides the dtype can actually exceed: decimal(p,0)
                # tops out at 10^p-1 < the int128/uint128 magnitude bounds, and
                # casting those 39-digit literals to decimal(38,0) overflows
                # (NULL, or ArithmeticException under ANSI) — so e.g. int128
                # over decimal(38,0) needs no range check at all, uint128 only
                # the >= 0 side.
                dmax = 10 ** dt.precision - 1
                pred = None
                if -dmax < int(lo):
                    pred = col >= F.lit(lo).cast(dt)
                if dmax > int(hi):
                    hi_ok = col <= F.lit(hi).cast(dt)
                    pred = hi_ok if pred is None else (pred & hi_ok)
                if pred is not None:
                    add(E.INSTANCE_NUMBER_OUT_OF_RANGE, pred)
            else:
                _require(False, t, dt, path)
        elif t == "decimal":
            if isinstance(dt, T.StringType):
                add(E.INSTANCE_DECIMAL_FORMAT_INVALID,
                    col.try_cast("double").isNotNull())
            else:
                _require(isinstance(dt, _FRACTIONAL + _INTEGRAL), t, dt, path)
        elif t in ("date", "datetime", "time", "duration", "jsonpointer"):
            code = {
                "date": E.INSTANCE_DATE_FORMAT_INVALID,
                "datetime": E.INSTANCE_DATETIME_FORMAT_INVALID,
                "time": E.INSTANCE_TIME_FORMAT_INVALID,
                "duration": E.INSTANCE_DURATION_FORMAT_INVALID,
                "jsonpointer": E.INSTANCE_JSONPOINTER_FORMAT_INVALID,
            }[t]
            if isinstance(dt, T.StringType):
                add(code, col.rlike(RX[t]))
            elif t == "date":
                _require(isinstance(dt, T.DateType), t, dt, path)
            elif t == "datetime":
                _require(isinstance(dt, (T.TimestampType, T.TimestampNTZType)), t, dt, path)
            else:
                _require(False, t, dt, path)
        elif t == "uuid":
            _require(isinstance(dt, T.StringType), t, dt, path)
            add(E.INSTANCE_UUID_FORMAT_INVALID, col.rlike(RX["uuid"]))
        elif t == "uri":
            _require(isinstance(dt, T.StringType), t, dt, path)
            add(E.INSTANCE_URI_FORMAT_INVALID, col.rlike(RX["uri"]))
        elif t == "binary":
            _require(isinstance(dt, (T.BinaryType, T.StringType)), t, dt, path)
        elif t == "object":
            out.extend(self._object(node, path, col, dt, ctx, depth))
        elif t in ("array", "set"):
            out.extend(self._array(node, t, path, col, dt, ctx, depth))
        elif t == "map":
            out.extend(self._map(node, path, col, dt, ctx, depth))
        elif t == "tuple":
            out.extend(self._tuple(node, path, col, dt, ctx, depth))
        elif t == "choice":
            out.extend(self._choice(node, path, col, dt, ctx, depth))
        else:
            raise SchemaCompileError(f"unknown type '{t}' at {path}")

        if ctx.validation:
            out.extend(self._addins(node, t, path, col, dt, ctx, depth))
        return out

    # .. object over a StructType column ..........................................
    def _object(self, node, path, col, dt, ctx, depth) -> list[Constraint]:
        _require(isinstance(dt, T.StructType), "object", dt, path)
        out: list[Constraint] = []
        by_name = {f.name: f.dataType for f in dt.fields}
        props = node.get("properties", {})
        for r in node.get("required", []) or []:
            field_ok = (col.getField(r).isNotNull() if r in by_name else F.lit(False))
            out.append(Constraint(E.INSTANCE_REQUIRED_PROPERTY_MISSING,
                                  f"{path}/{r}",
                                  _present(col, field_ok),
                                  F.lit(None).cast("string")))
        for name, sub in props.items():
            if name in by_name:
                inner = self._node(sub, f"{path}/{name}", col.getField(name),
                                   by_name[name], ctx, depth + 1)
                # a NULL parent struct must not fail child checks
                out.extend(Constraint(c.cid, c.path,
                                      F.when(col.isNull(), F.lit(True)).otherwise(c.ok),
                                      c.value) for c in inner)
        if "has" in node:
            has_ok = F.lit(False)
            for name, fdt in by_name.items():
                try:
                    has_ok = has_ok | (col.getField(name).isNotNull()
                                       & self._valid(node["has"], col.getField(name),
                                                     fdt, ctx, depth + 1))
                except SchemaCompileError:
                    continue
            out.append(Constraint(E.INSTANCE_HAS_NO_MATCH, path,
                                  _present(col, has_ok), _render(col, dt)))
        if ctx.validation:
            present = [col.getField(n).isNotNull().cast("int") for n in by_name] \
                or [F.lit(0)]
            nprops = reduce(lambda a, b: a + b, present)
            if "minProperties" in node:
                out.append(Constraint(E.INSTANCE_MIN_PROPERTIES, path,
                                      _present(col, nprops >= F.lit(node["minProperties"])),
                                      nprops.cast("string")))
            if "maxProperties" in node:
                out.append(Constraint(E.INSTANCE_MAX_PROPERTIES, path,
                                      _present(col, nprops <= F.lit(node["maxProperties"])),
                                      nprops.cast("string")))
            if isinstance(node.get("dependentRequired"), dict):
                for trig, deps in node["dependentRequired"].items():
                    if trig not in by_name or not isinstance(deps, list):
                        continue
                    for d in deps:
                        dep_ok = (col.getField(d).isNotNull() if d in by_name
                                  else F.lit(False))
                        out.append(Constraint(
                            E.INSTANCE_DEPENDENT_REQUIRED, f"{path}/{trig}",
                            _present(col, F.when(col.getField(trig).isNull(),
                                                 F.lit(True)).otherwise(dep_ok)),
                            F.lit(f"{trig} -> {d}")))
            if isinstance(node.get("patternProperties"), dict):
                # struct keys are static: match property names at compile time
                for pat, sub in node["patternProperties"].items():
                    rx = _compile_or_raise(pat, f"{path}/patternProperties")
                    for name, fdt in by_name.items():
                        if rx.search(name):
                            out.extend(self._node(sub, f"{path}/{name}",
                                                  col.getField(name), fdt, ctx,
                                                  depth + 1))
            if "propertyNames" in node and isinstance(node["propertyNames"], dict):
                # constant-fold static keys through the row kernel
                checker = RowChecker(node["propertyNames"], extended=True)
                for name in by_name:
                    if not checker.is_valid(name):
                        out.append(Constraint(E.INSTANCE_PROPERTY_NAME_INVALID,
                                              f"{path}/{name}", F.lit(False),
                                              F.lit(name)))
        return out

    # .. array / set over ArrayType ...............................................
    def _array(self, node, t, path, col, dt, ctx, depth) -> list[Constraint]:
        _require(isinstance(dt, T.ArrayType), t, dt, path)
        et = dt.elementType
        out: list[Constraint] = []
        val = _render(col, dt)
        items = node.get("items")
        if items:
            # one array-level constraint per inner constraint code so that
            # violation rows keep precise codes (forall over the elements)
            inner_codes = self._inner_codes(items, et, ctx, depth)
            for cid in inner_codes:
                pred = self._forall_code(col, items, et, ctx, depth, cid)
                out.append(Constraint(cid, f"{path}[]", _present(col, pred), val))
        if t == "set" or node.get("uniqueItems") is True:
            if _is_atomic(et):
                uniq = F.size(F.array_distinct(col)) == F.size(col)
            else:
                uniq = (F.size(F.array_distinct(F.transform(col, F.to_json)))
                        == F.size(col))
            gate = (t == "set") or ctx.validation
            if gate:
                out.append(Constraint(E.INSTANCE_SET_DUPLICATE, path,
                                      _present(col, uniq), val))
        if ctx.validation:
            if "minItems" in node:
                out.append(Constraint(E.INSTANCE_MIN_ITEMS, path,
                                      _present(col, F.size(col) >= F.lit(node["minItems"])),
                                      F.size(col).cast("string")))
            if "maxItems" in node:
                out.append(Constraint(E.INSTANCE_MAX_ITEMS, path,
                                      _present(col, F.size(col) <= F.lit(node["maxItems"])),
                                      F.size(col).cast("string")))
            if "contains" in node:
                contains = node["contains"]
                cnt = F.size(F.filter(
                    col, lambda x: self._valid(contains, x, et,
                                               ctx.lambda_ctx(), depth + 1)))
                out.append(Constraint(E.INSTANCE_CONTAINS_NONE, path,
                                      _present(col, cnt > F.lit(0)), val))
                if "minContains" in node:
                    out.append(Constraint(E.INSTANCE_MIN_CONTAINS, path,
                                          _present(col, cnt >= F.lit(node["minContains"])),
                                          cnt.cast("string")))
                if "maxContains" in node:
                    out.append(Constraint(E.INSTANCE_MAX_CONTAINS, path,
                                          _present(col, cnt <= F.lit(node["maxContains"])),
                                          cnt.cast("string")))
        return out

    def _inner_codes(self, items: dict, et: T.DataType, ctx: Ctx,
                     depth: int) -> list[str]:
        probe = self._node(items, "#", F.lit(None).cast(et), et,
                           ctx.lambda_ctx(), depth + 1)
        seen: list[str] = []
        for c in probe:
            if c.cid not in seen:
                seen.append(c.cid)
        return seen

    def _forall_code(self, arr: Column, items: dict, et: T.DataType, ctx: Ctx,
                     depth: int, cid: str) -> Column:
        # NOTE: must be a dedicated closure — a default-arg lambda
        # (``lambda x, c=cid``) changes the arity PySpark infers for the
        # higher-order function and it would bind c to the index variable.
        return F.forall(arr, lambda x: self._code_ok(items, x, et, ctx, depth, cid))

    def _code_ok(self, items: dict, x: Column, et: T.DataType, ctx: Ctx,
                 depth: int, cid: str) -> Column:
        cons = [c for c in self._node(items, "#", x, et, ctx.lambda_ctx(),
                                      depth + 1)
                if c.cid == cid]
        if not cons:
            return F.lit(True)
        return reduce(lambda a, b: a & b, [c.ok for c in cons])

    # .. map over MapType ..........................................................
    def _map(self, node, path, col, dt, ctx, depth) -> list[Constraint]:
        _require(isinstance(dt, T.MapType), "map", dt, path)
        vt = dt.valueType
        out: list[Constraint] = []
        val = _render(col, dt)
        values = node.get("values")
        if values:
            for cid in self._inner_codes(values, vt, ctx, depth):
                pred = self._forall_code(F.map_values(col), values, vt, ctx, depth, cid)
                out.append(Constraint(cid, f"{path}/*", _present(col, pred), val))
        if ctx.validation:
            if "minEntries" in node:
                out.append(Constraint(E.INSTANCE_MAP_MIN_ENTRIES, path,
                                      _present(col, F.size(col) >= F.lit(node["minEntries"])),
                                      F.size(col).cast("string")))
            if "maxEntries" in node:
                out.append(Constraint(E.INSTANCE_MAP_MAX_ENTRIES, path,
                                      _present(col, F.size(col) <= F.lit(node["maxEntries"])),
                                      F.size(col).cast("string")))
            if isinstance(node.get("patternKeys"), dict):
                for pat, sub in node["patternKeys"].items():
                    java_pat = pat
                    if not java_safe(java_pat):
                        raise SchemaCompileError(
                            f"patternKeys regex {java_pat!r} is not Java-dialect"
                            " safe; route through the row kernel")
                    matching = F.map_filter(col, lambda k, v: k.rlike(java_pat))
                    pred = F.forall(F.map_values(matching),
                                    lambda v: self._valid(sub, v, vt,
                                                          ctx.lambda_ctx(),
                                                          depth + 1))
                    out.append(Constraint(E.INSTANCE_MAP_KEY_INVALID, path,
                                          _present(col, pred), val))
            if isinstance(node.get("keyNames"), dict):
                kn = dict(node["keyNames"])
                uses = list(kn.get("$uses", []))
                if "JSONStructureValidation" not in uses:
                    uses.append("JSONStructureValidation")
                kn["$uses"] = uses
                kn_ctx = ctx.with_node(kn)
                pred = F.forall(F.map_keys(col),
                                lambda k: self._valid(kn, k, T.StringType(),
                                                      kn_ctx.lambda_ctx(),
                                                      depth + 1))
                out.append(Constraint(E.INSTANCE_MAP_KEY_INVALID, path,
                                      _present(col, pred), val))
        return out

    # .. tuple over StructType (positional fields) ..................................
    def _tuple(self, node, path, col, dt, ctx, depth) -> list[Constraint]:
        _require(isinstance(dt, T.StructType), "tuple", dt, path)
        props = node.get("properties", {})
        order = node.get("tuple", [])
        by_name = {f.name: f.dataType for f in dt.fields}
        out: list[Constraint] = []
        for name in order:
            if name in props and name in by_name:
                inner = self._node(props[name], f"{path}/{name}",
                                   col.getField(name), by_name[name], ctx, depth + 1)
                out.extend(Constraint(c.cid, c.path,
                                      F.when(col.isNull(), F.lit(True)).otherwise(c.ok),
                                      c.value) for c in inner)
        return out

    # .. choice (tagged union) over StructType .......................................
    def _choice(self, node, path, col, dt, ctx, depth) -> list[Constraint]:
        _require(isinstance(dt, T.StructType), "choice", dt, path)
        choices = node.get("choices", {})
        by_name = {f.name: f.dataType for f in dt.fields}
        out: list[Constraint] = []
        set_fields = [col.getField(f.name).isNotNull().cast("int") for f in dt.fields]
        nset = reduce(lambda a, b: a + b, set_fields) if set_fields else F.lit(0)
        out.append(Constraint(E.INSTANCE_CHOICE_INVALID, path,
                              _present(col, nset == F.lit(1)), _render(col, dt)))
        for name, sub in choices.items():
            if name not in by_name:
                continue
            inner = self._node(sub, f"{path}/{name}", col.getField(name),
                               by_name[name], ctx, depth + 1)
            out.extend(Constraint(c.cid, c.path,
                                  F.when(col.isNull() | col.getField(name).isNull(),
                                         F.lit(True)).otherwise(c.ok),
                                  c.value) for c in inner)
        return out

    # .. conditional composition ....................................................
    def _inherit_uses(self, sub: Any) -> Any:
        """Conditional branches inherit the root document's $uses
        (reference: instance_validator.py:736-745)."""
        root_uses = self.doc.get("$uses") if isinstance(self.doc, dict) else None
        if not root_uses or not isinstance(sub, dict):
            return sub
        merged = dict(sub)
        have = list(merged.get("$uses", []))
        for u in root_uses:
            if u not in have:
                have.append(u)
        merged["$uses"] = have
        return merged

    def _conditional_constraints(self, node, path, col, dt, ctx, depth):
        out: list[Constraint] = []
        val = _render(col, dt)
        if "allOf" in node:
            for i, sub in enumerate(node["allOf"]):
                out.extend(self._node(self._inherit_uses(sub),
                                      f"{path}/allOf[{i}]", col, dt, ctx,
                                      depth + 1))
        if "anyOf" in node:
            branch = [self._valid(self._inherit_uses(s), col, dt, ctx, depth + 1)
                      for s in node["anyOf"]]
            out.append(Constraint(E.INSTANCE_ANY_OF_NONE_MATCHED, path,
                                  _present(col, reduce(lambda a, b: a | b, branch)),
                                  val))
        if "oneOf" in node:
            hits = [F.coalesce(self._valid(self._inherit_uses(s), col, dt,
                                           ctx, depth + 1),
                               F.lit(False)).cast("int") for s in node["oneOf"]]
            total = reduce(lambda a, b: a + b, hits)
            out.append(Constraint(E.INSTANCE_ONE_OF_INVALID_COUNT, path,
                                  _present(col, total == F.lit(1)), val))
        if "not" in node:
            out.append(Constraint(E.INSTANCE_NOT_MATCHED, path,
                                  _present(col, ~F.coalesce(
                                      self._valid(node["not"], col, dt, ctx, depth + 1),
                                      F.lit(False))),
                                  val))
        if "if" in node:
            cond = F.coalesce(self._valid(node["if"], col, dt, ctx, depth + 1),
                              F.lit(False))
            then_ok = (self._valid(node["then"], col, dt, ctx, depth + 1)
                       if "then" in node else F.lit(True))
            else_ok = (self._valid(node["else"], col, dt, ctx, depth + 1)
                       if "else" in node else F.lit(True))
            out.append(Constraint(E.INSTANCE_CONDITIONAL_FAILED, path,
                                  _present(col, F.when(cond, then_ok).otherwise(else_ok)),
                                  val))
        return out

    # .. validation addins ...........................................................
    def _addins(self, node, t, path, col, dt, ctx, depth) -> list[Constraint]:
        out: list[Constraint] = []
        val = _render(col, dt)

        def add(cid, pred):
            out.append(Constraint(cid, path, _present(col, pred), val))

        if t in NUMERIC_TYPES:
            num = (col.try_cast("double") if isinstance(dt, T.StringType)
                   else col)
            # string-backed integer types (int64/uint64/int128/uint128):
            # a double cast collapses adjacent values past 2^53, silently
            # missing/inventing bound violations near the 64/128-bit limits
            # (reference compares exact parsed values:
            # instance_validator.py:372-411). Compare digit strings instead.
            int_backed = (isinstance(dt, T.StringType) and t in STRING_BACKED
                          and t != "decimal")
            dec_backed = isinstance(dt, T.StringType) and t == "decimal"

            def cmp(x, op: str) -> Column:
                if int_backed:
                    pred = _bigint_bound(col, x, op)
                    if pred is not None:
                        # malformed digits already fail NUMBER_FORMAT_INVALID
                        return F.when(col.rlike(RX["int"]), pred).otherwise(F.lit(True))
                if dec_backed:
                    # same malformed-input guard as the int-backed path: an
                    # unparseable string already fails DECIMAL_FORMAT_INVALID;
                    # without the guard it would double-report every bound too
                    return F.when(col.try_cast("double").isNotNull(),
                                  _decimal_bound(col, x, op)).otherwise(F.lit(True))
                b = F.lit(float(x) if isinstance(x, str) else x)
                return {"ge": num >= b, "le": num <= b,
                        "gt": num > b, "lt": num < b}[op]

            if "minimum" in node:
                add(E.INSTANCE_NUMBER_MINIMUM, cmp(node["minimum"], "ge"))
            if "maximum" in node:
                add(E.INSTANCE_NUMBER_MAXIMUM, cmp(node["maximum"], "le"))
            if "exclusiveMinimum" in node:
                em = node["exclusiveMinimum"]
                if isinstance(em, bool):
                    if em and "minimum" in node:
                        add(E.INSTANCE_NUMBER_EXCLUSIVE_MINIMUM,
                            cmp(node["minimum"], "gt"))
                else:
                    add(E.INSTANCE_NUMBER_EXCLUSIVE_MINIMUM, cmp(em, "gt"))
            if "exclusiveMaximum" in node:
                em = node["exclusiveMaximum"]
                if isinstance(em, bool):
                    if em and "maximum" in node:
                        add(E.INSTANCE_NUMBER_EXCLUSIVE_MAXIMUM,
                            cmp(node["maximum"], "lt"))
                else:
                    add(E.INSTANCE_NUMBER_EXCLUSIVE_MAXIMUM, cmp(em, "lt"))
            if "multipleOf" in node:
                # quotient-rounding with 1e-10 tolerance, NOT modulo
                # (reference: instance_validator.py:879-888); for
                # string-backed ints >2^53 the double quotient is a KNOWN,
                # documented divergence (test_regex_and_precision.py) — the
                # exact digit-string machinery covers bounds, not division.
                # String-backed types get the same malformed-input guard as
                # cmp(): the kernel parses the digit string FIRST and skips
                # every numeric addin on parse failure, so an unparseable
                # value reports FORMAT_INVALID alone on both paths
                # (r5 review finding; pinned by test_review_fixes_r5)
                q = num.cast("double") / F.lit(float(node["multipleOf"]))
                mok = F.abs(q - F.round(q, 0)) <= F.lit(1e-10)
                if int_backed:
                    mok = F.when(col.rlike(RX["int"]), mok) \
                        .otherwise(F.lit(True))
                elif dec_backed:
                    mok = F.when(col.try_cast("double").isNotNull(), mok) \
                        .otherwise(F.lit(True))
                add(E.INSTANCE_NUMBER_MULTIPLE_OF, mok)
        if t == "string" and isinstance(dt, T.StringType):
            if "minLength" in node:
                add(E.INSTANCE_STRING_MIN_LENGTH,
                    F.length(col) >= F.lit(node["minLength"]))
            if "maxLength" in node:
                add(E.INSTANCE_STRING_MAX_LENGTH,
                    F.length(col) <= F.lit(node["maxLength"]))
            if "pattern" in node:
                pat = node["pattern"]
                try:
                    python_compile(pat)
                except re.error as exc:
                    raise SchemaCompileError(
                        f"invalid regex {pat!r} at {path}: {exc}") from exc
                if java_safe(pat):
                    # unanchored search semantics == Java find() == rlike
                    add(E.INSTANCE_STRING_PATTERN_MISMATCH, col.rlike(pat))
                elif ctx.in_lambda:
                    # pandas fallback can't see HOF lambda variables; the
                    # auto plan reroutes the schema to the row kernel
                    raise SchemaCompileError(
                        f"python-dialect regex {pat!r} at {path} inside an"
                        " array/map context cannot lower to Catalyst")
                else:
                    # Python-dialect construct: Arrow-batched re.search keeps
                    # reference semantics without leaving the compiled plan
                    add(E.INSTANCE_STRING_PATTERN_MISMATCH,
                        python_regex_match(col, pat))
            if "format" in node and node["format"] in RX:
                add(E.INSTANCE_FORMAT_INVALID, col.rlike(RX[node["format"]]))
        return out

    # -- plan application --------------------------------------------------------
    def validate(self, df: DataFrame) -> DataFrame:
        """Append ``violations`` (array<struct<constraint_id,path,value>>,
        one NULL-padded slot per compiled constraint), ``violation_count``
        (int) and ``valid`` (boolean) in a single projection.

        The array deliberately keeps NULL cells for passing constraints:
        ``array_compact`` lowers to an ``ArrayFilter`` higher-order function
        that Spark evaluates on the interpreted expression path — measured
        5-8× slower than whole-stage-codegen at 6M rows — and CollapseProject
        duplicates it into every downstream use.  Consumers read
        ``violation_count``/``valid`` (plain codegen arithmetic) or
        ``violation_rows`` (explode + null filter, both codegen)."""
        clash = [c for c in ("violations", "violation_count", "valid")
                 if c in df.columns]
        if clash:
            # silently overwriting e.g. a business 'valid' column (or a
            # prior validation's verdicts) loses caller data — refuse
            # loudly; re-validation should drop the old columns first
            raise ValueError(
                f"input already has validation output column(s) {clash} — "
                f"drop or rename them before validate()")
        cons = self.constraints(df)
        cells = [
            F.when(~c.ok, F.struct(
                F.lit(c.cid).alias("constraint_id"),
                F.lit(c.path).alias("path"),
                c.value.cast("string").alias("value"),
            ))
            for c in cons
        ]
        if cells:
            arr = F.array(*cells)
            # per-cell coalesce: a NULL ok (absent field) is not a violation
            count = reduce(lambda a, b: a + b,
                           [F.coalesce((~c.ok).cast("int"), F.lit(0))
                            for c in cons])
        else:
            arr = F.array().cast(VIOLATION_SCHEMA)
            count = F.lit(0)
        return df.withColumn("violations", arr) \
                 .withColumn("violation_count", count) \
                 .withColumn("valid", count == F.lit(0))


def _root_null_ok(node: dict, col: Column) -> Column:
    """A NULL root instance is a type error unless the type admits null
    (reference treats e.g. None-vs-string as 'Expected string')."""
    t = node.get("type")
    if t in ("null", "any") or (isinstance(t, list) and "null" in t):
        return F.lit(True)
    return col.isNotNull()


def _has_imports(obj: Any) -> bool:
    if isinstance(obj, dict):
        if "$import" in obj or "$importdefs" in obj:
            return True
        return any(_has_imports(v) for k, v in obj.items() if k != "properties")
    if isinstance(obj, list):
        return any(_has_imports(x) for x in obj)
    return False


def _require(cond: bool, t: str, dt: T.DataType, path: str) -> None:
    if not cond:
        raise SchemaCompileError(
            f"schema type '{t}' at {path} is incompatible with column type {dt.simpleString()}")


def _dtype_can_exceed(dt: T.DataType, lo: int, hi: int) -> bool:
    limits = {
        T.ByteType: (-(2**7), 2**7 - 1),
        T.ShortType: (-(2**15), 2**15 - 1),
        T.IntegerType: (-(2**31), 2**31 - 1),
        T.LongType: (-(2**63), 2**63 - 1),
    }
    dlo, dhi = limits.get(type(dt), (float("-inf"), float("inf")))
    return dlo < lo or dhi > hi


def _as_exact_int_bound(x, op: str) -> int | None:
    """Reduce a schema bound to an exact integer bound for integer-valued
    columns: ``v >= x ⟺ v >= ceil(x)``, ``v > x ⟺ v >= floor(x)+1``,
    ``v <= x ⟺ v <= floor(x)``, ``v < x ⟺ v <= ceil(x)-1`` (v integral).
    Returns None when x isn't numeric."""
    import math
    from fractions import Fraction

    try:
        frac = Fraction(str(x)) if isinstance(x, str) else Fraction(x)
    except (ValueError, ZeroDivisionError):
        return None
    if op in ("ge", "lt"):
        return math.ceil(frac)
    return math.floor(frac)


def _decimal_bound(col: Column, x, op: str) -> Column:
    """Exact bound predicate for decimals carried as strings.

    A ``try_cast`` to ``decimal(38,12)`` is NOT exact: >26 integer digits
    cast to NULL (which ``_present`` would coerce to a false violation) and
    >12 fractional digits round, both diverging from the row kernel's
    ``decimal.Decimal`` compare.  Instead, plain decimal strings are scaled
    by 10^S (S = the bound's fractional digits) via digit-string surgery and
    compared with the same arbitrary-precision scheme as int128
    (``_bigint_lt``); digits truncated past S only matter at equality, where
    the nonzero-tail flag decides.  Exponent-notation values (valid per the
    decimal format check) fall back to a double compare — exact beyond
    double precision is not expressible for e-notation in Catalyst, and the
    kernel parity test documents that residual divergence.
    """
    import decimal

    B = decimal.Decimal(str(x))
    S = max(0, -B.as_tuple().exponent)
    b10 = int(B.scaleb(S))

    plain = col.rlike(r"^[+-]?[0-9]+(\.[0-9]+)?$")
    int_part = F.regexp_extract(col, r"^[+-]?([0-9]+)", 1)
    frac = F.regexp_extract(col, r"\.([0-9]+)$", 1)
    frac_s = F.rpad(F.substring(frac, 1, S), S, "0") if S else F.lit("")
    tail = F.substring(frac, S + 1, 1 << 20).rlike("[1-9]")
    mag = F.regexp_replace(F.concat(int_part, frac_s), r"^0+(?=[0-9])", "")
    neg = col.startswith("-")
    signed = F.when(neg & (mag != F.lit("0")),
                    F.concat(F.lit("-"), mag)).otherwise(mag)

    lt_b = _bigint_lt(signed, b10)          # trunc(v·10^S) <  b·10^S
    gt_b = ~_bigint_lt(signed, b10 + 1)     # trunc(v·10^S) >  b·10^S
    eq_b = ~lt_b & ~gt_b
    # truncation is toward zero: v ∈ [t, t+1) for v ≥ 0, v ∈ (t-1, t] for
    # v < 0 — so the tail flag flips the verdict only at eq_b, directionally
    ge = F.when(neg, gt_b | (eq_b & ~tail)).otherwise(~lt_b)
    gt = F.when(neg, gt_b).otherwise(gt_b | (eq_b & tail))
    exact = {"ge": ge, "gt": gt, "le": ~gt, "lt": ~ge}[op]

    d = col.try_cast("double")
    bd = F.lit(float(B))
    approx = {"ge": d >= bd, "le": d <= bd, "gt": d > bd, "lt": d < bd}[op]
    return F.when(plain, exact).otherwise(approx)


def _bigint_bound(col: Column, x, op: str) -> Column | None:
    """Exact bound predicate for integers carried as digit strings; None
    when the bound can't be reduced to an exact integer comparison."""
    b = _as_exact_int_bound(x, op)
    if b is None:
        return None
    if op == "ge":
        return ~_bigint_lt(col, b)
    if op == "gt":
        return ~_bigint_lt(col, b + 1)
    if op == "le":
        return _bigint_lt(col, b + 1)
    # op == "lt": v < x ⟺ v <= ceil(x)-1 ⟺ v < ceil(x)  (b = ceil(x))
    return _bigint_lt(col, b)


def _bigint_lt(col: Column, b: int) -> Column:
    """col (canonical digit string) < b, exact at arbitrary precision.

    Same (sign, digit-count, lexicographic) scheme as ``_bigint_in_range``."""
    digits = F.regexp_replace(col, r"^[+-]", "")
    digits = F.regexp_replace(digits, r"^0+(?=\d)", "")
    neg = col.startswith("-") & (digits != F.lit("0"))
    bd = str(abs(b))

    def lt_mag(a: Column) -> Column:  # |a| < |b|
        return (F.length(a) < F.lit(len(bd))) | (
            (F.length(a) == F.lit(len(bd))) & (a < F.lit(bd)))

    def gt_mag(a: Column) -> Column:  # |a| > |b|
        return (F.length(a) > F.lit(len(bd))) | (
            (F.length(a) == F.lit(len(bd))) & (a > F.lit(bd)))

    if b > 0:
        return neg | lt_mag(digits)
    if b == 0:
        return neg
    return neg & gt_mag(digits)


def _bigint_in_range(col: Column, lo: str, hi: str) -> Column:
    """Range check for 64/128-bit integers carried as digit strings.

    decimal(38,0) cannot hold 2^127, so compare by (sign, digit-count,
    lexicographic) — valid for canonical digit strings."""
    digits = F.regexp_replace(col, r"^[+-]", "")
    digits = F.regexp_replace(digits, r"^0+(?=\d)", "")
    neg = col.startswith("-") & (digits != F.lit("0"))

    def cmp_le(a_digits, b: str):
        blen = len(b)
        return (F.length(a_digits) < F.lit(blen)) | (
            (F.length(a_digits) == F.lit(blen)) & (a_digits <= F.lit(b)))

    hi_digits = hi.lstrip("+-")
    lo_digits = lo.lstrip("+-")
    pos_ok = cmp_le(digits, hi_digits)
    if lo.startswith("-"):
        neg_ok = cmp_le(digits, lo_digits)
        return F.when(neg, neg_ok).otherwise(pos_ok)
    return ~neg & pos_ok


# ---------------------------------------------------------------------------
# runtime helpers

VIOLATION_SCHEMA = "array<struct<constraint_id:string,path:string,value:string>>"


def violation_rows(validated: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode the violations array into one row per (key, violation).

    Explode-then-filter, both whole-stage-codegen: the array keeps a NULL
    cell per passing constraint (see ``CompiledSchema.validate``), and a
    post-Generate null filter is 5× cheaper than compacting the array with
    an interpreted higher-order function before exploding.  No pre-filter
    on size: ``where(violation_count > 0)`` would duplicate the whole
    constraint computation into the Filter condition (Catalyst does not
    CSE across Filter/Project here)."""
    v = F.explode(F.col("violations")).alias("v")
    return (validated
            .select(*key_cols, v)
            .where(F.col("v").isNotNull())
            .select(*key_cols,
                    F.col("v.constraint_id").alias("constraint_id"),
                    F.col("v.path").alias("path"),
                    F.col("v.value").alias("value")))


def verdict_aggs() -> list[Column]:
    """THE verdict-metric definition, shared by every aggregation surface
    (``partition_verdicts``, streaming ``windowed_verdicts``, the manifest's
    per-partition metrics) so the semantics cannot silently diverge."""
    return [F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("valid").cast("long")).alias("valid_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
            F.sum(F.col("violation_count").cast("long"))
            .alias("violation_count")]


def partition_verdicts(validated: DataFrame,
                       partition_col: str | None = None) -> DataFrame:
    """Per-partition pass/fail verdict: one cheap shuffle of partition-count rows."""
    part = (F.col(partition_col) if partition_col
            else F.spark_partition_id()).alias("partition")
    return (validated
            .groupBy(part)
            .agg(*verdict_aggs())
            .withColumn("passed", F.col("invalid_rows") == F.lit(0)))
