"""Row-level JSON Structure instance checking (pure Python kernel).

This module is the engine's *semantic core* for validating one JSON value
against a JSON Structure schema.  It re-implements, from scratch, the
behavior of the reference validator
(reference: python/src/json_structure/instance_validator.py:105-644) with
two differences:

* findings carry standardized constraint codes (``sdk_spark.errors``)
  instead of free-text messages, so they can be emitted as violation rows;
* it is written as a small dispatch-table evaluator, so the Arrow batch
  wrapper (``sdk_spark.operators.jsonbatch``) can call it per value inside
  a ``mapInPandas`` kernel without any driver round-trips.

In the engine this kernel is the SLOW PATH: it only runs for
schema-flexible JSON input (arbitrary nesting / runtime type dispatch /
recursive schemas).  Typed tables are validated by the Catalyst compiler
(``sdk_spark.compiler``) which never leaves the JVM.
"""

from __future__ import annotations

import decimal as _decimal
import json
import re
import uuid as _uuid
from typing import Any
from urllib.parse import urlparse

from . import errors as E

RX_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
RX_DATETIME = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+\-]\d{2}:\d{2})$")
RX_TIME = re.compile(r"^\d{2}:\d{2}:\d{2}(?:\.\d+)?$")
RX_DURATION = re.compile(
    r"^P(?:\d+Y)?(?:\d+M)?(?:\d+D)?(?:T(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?$|^P\d+W$"
)
RX_JSONPOINTER = re.compile(r"^#(\/[^\/]+)*$")
RX_EMAIL = re.compile(r"^[^@]+@[^@]+\.[^@]+$")
RX_IPV6 = re.compile(r"^[0-9a-fA-F:]+$")
RX_HOSTNAME = re.compile(r"^[a-zA-Z0-9.-]+$")

INT_RANGES = {
    "int8": (-(2**7), 2**7 - 1),
    "uint8": (0, 2**8 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "uint16": (0, 2**16 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "integer": (-(2**31), 2**31 - 1),
    "uint32": (0, 2**32 - 1),
}
# Wide numerics are string-encoded in the JSON text (reference:
# instance_validator.py:372-411 requires isinstance(instance, str)).
BIGINT_RANGES = {
    "int64": (-(2**63), 2**63 - 1),
    "uint64": (0, 2**64 - 1),
    "int128": (-(2**127), 2**127 - 1),
    "uint128": (0, 2**128 - 1),
}
NUMERIC_ADDIN_TYPES = {
    "number", "integer", "float", "double", "decimal", "float8",
    "int8", "uint8", "int16", "uint16", "int32", "uint32",
    "int64", "uint64", "int128", "uint128",
}
CONDITIONAL_KEYWORDS = ("allOf", "anyOf", "oneOf", "not", "if", "then", "else")
BUILTIN_ADDINS = (
    "JSONStructureValidation",
    "JSONStructureConditionalComposition",
    "JSONStructureAlternateNames",
    "JSONStructureUnits",
)
META_CORE = "https://json-structure.org/meta/core/v0/#"
META_VALIDATION = "https://json-structure.org/meta/validation/v0/#"
META_EXTENDED = "https://json-structure.org/meta/extended/v0/#"


class Finding:
    """One violation: (code, json path, offending value rendered to str)."""

    __slots__ = ("code", "path", "value")

    def __init__(self, code: str, path: str, value: Any = None):
        self.code = code
        self.path = path
        try:
            self.value = None if value is None else json.dumps(value, default=str)[:256]
        except (TypeError, ValueError):
            self.value = str(value)[:256]

    def __repr__(self) -> str:
        return f"{self.path} [{self.code}] {self.value}"


def _canon(x: Any) -> str:
    return json.dumps(x, sort_keys=True, default=str)


class RowChecker:
    """Validates JSON values against one schema document.

    Construct once per schema (driver side or once per Arrow batch task);
    ``check(value)`` returns a list of :class:`Finding`.
    """

    def __init__(self, root: dict, extended: bool = False, max_depth: int = 256):
        self.root = root
        self.extended = extended
        self.max_depth = max_depth
        schema_uri = root.get("$schema", "") if isinstance(root, dict) else ""
        self.is_validation_meta = schema_uri.endswith("/validation/v0/#")
        self.is_extended_meta = schema_uri.endswith("/extended/v0/#")
        self.exts: set[str] = set()
        if "extended" in schema_uri or "validation" in schema_uri:
            self.exts.update(("JSONStructureConditionalComposition", "JSONStructureValidation"))
        uses = root.get("$uses", []) if isinstance(root, dict) else []
        if isinstance(uses, list):
            self.exts.update(u for u in uses if isinstance(u, str))
        if extended:
            self.exts.update(("JSONStructureConditionalComposition", "JSONStructureValidation"))
        # extended metaschema + $uses present => all built-in addins active
        # (reference: instance_validator.py:130-144)
        if self.is_extended_meta and isinstance(root, dict) and "$uses" in root:
            self.exts.update(BUILTIN_ADDINS)
        self._root_uses_conditionals = (
            isinstance(root, dict)
            and isinstance(root.get("$uses"), list)
            and (self.is_extended_meta            # auto-appended addins
                 or "JSONStructureConditionalComposition" in root["$uses"])
        )

    # -- public API ----------------------------------------------------------
    def check(self, value: Any) -> list[Finding]:
        out: list[Finding] = []
        self._node(value, None, "#", out, 0)
        return out

    def is_valid(self, value: Any) -> bool:
        return not self.check(value)

    # -- ref plumbing ---------------------------------------------------------
    def _deref(self, pointer: str) -> Any:
        if not isinstance(pointer, str) or not pointer.startswith("#"):
            return None
        node: Any = self.root
        for seg in pointer.lstrip("#").split("/"):
            if seg == "":
                continue
            seg = seg.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict) and seg in node:
                node = node[seg]
            else:
                return None
        return node

    # -- core recursion ---------------------------------------------------------
    def _node(self, value: Any, schema: Any, path: str, out: list[Finding], depth: int) -> None:
        if depth > self.max_depth:
            out.append(Finding("INSTANCE_MAX_DEPTH_EXCEEDED", path, None))
            return
        if schema is None:
            schema = self.root
            if isinstance(schema, dict) and "$root" in schema and "type" not in schema:
                target = self._deref(schema["$root"])
                if target is None:
                    out.append(Finding(E.INSTANCE_ROOT_UNRESOLVED, path, schema.get("$root")))
                    return
                self._node(value, target, path, out, depth + 1)
                return
        if not isinstance(schema, dict):
            out.append(Finding(E.SCHEMA_INVALID_TYPE, path, None))
            return

        # instance-side $uses gating against the core metaschema
        # (reference: instance_validator.py:146-160)
        uses_in_instance = isinstance(value, dict) and "$uses" in value
        if uses_in_instance and self.root.get("$schema") == META_CORE:
            wanted = value["$uses"] if isinstance(value["$uses"], list) else [value["$uses"]]
            if ("JSONStructureValidation" in wanted
                    or "JSONStructureConditionalComposition" in wanted):
                out.append(Finding(E.INSTANCE_ADDIN_NOT_SUPPORTED, path, wanted))

        if "$ref" in schema:
            target = self._deref(schema["$ref"])
            if target is None:
                out.append(Finding(E.INSTANCE_REF_UNRESOLVED, path, schema["$ref"]))
                return
            self._node(value, target, path, out, depth + 1)
            return

        stype = schema.get("type")

        # schemas that are *only* conditional composition (no 'type')
        if not stype and any(k in schema for k in CONDITIONAL_KEYWORDS):
            enabled = (
                self.extended or self.is_validation_meta
                or "JSONStructureConditionalComposition" in self.exts
                or "JSONStructureValidation" in self.exts
            )
            if self.is_extended_meta and not self._root_uses_conditionals:
                out.append(Finding(E.INSTANCE_CONDITIONAL_FAILED, path,
                                   "conditional composition not enabled"))
                return
            if enabled:
                self._conditionals(value, schema, path, out, depth)
            else:
                out.append(Finding(E.INSTANCE_CONDITIONAL_FAILED, path,
                                   "conditional keywords present but not enabled"))
            return

        if not stype:
            out.append(Finding(E.SCHEMA_MISSING_TYPE, path, None))
            return

        # type: {$ref: ...} merge (reference: instance_validator.py:209-240)
        if isinstance(stype, dict):
            if "$ref" not in stype:
                out.append(Finding(E.SCHEMA_TYPE_INVALID, path, None))
                return
            target = self._deref(stype["$ref"])
            if target is None:
                out.append(Finding(E.INSTANCE_REF_UNRESOLVED, path, stype["$ref"]))
                return
            merged = dict(schema)
            merged["type"] = target.get("type")
            if "properties" in target:
                props = dict(target["properties"])
                props.update(merged.get("properties", {}))
                merged["properties"] = props
            for kw in ("tuple", "choices", "selector"):
                if kw in target:
                    merged[kw] = target[kw]
            for kw in ("required", "$extends"):
                if kw in target and kw not in merged:
                    merged[kw] = target[kw]
            schema, stype = merged, merged.get("type")

        # type union: first branch that validates wins
        # (reference: instance_validator.py:242-258)
        if isinstance(stype, list):
            for t in stype:
                probe: list[Finding] = []
                self._node(value, {"type": t}, path, probe, depth + 1)
                if not probe:
                    return
            out.append(Finding(E.INSTANCE_UNION_NO_MATCH, path, value))
            return

        if not isinstance(stype, str):
            out.append(Finding(E.SCHEMA_TYPE_INVALID, path, None))
            return

        # $extends flattening (non-choice): first-wins property merge,
        # redefinition of an inherited property is an error
        # (reference: instance_validator.py:264-314)
        if stype != "choice" and "$extends" in schema:
            refs = schema["$extends"]
            refs = [refs] if isinstance(refs, str) else [r for r in refs if isinstance(r, str)]
            if refs:
                base_props: dict = {}
                req: set[str] = set()
                for r in refs:
                    base = self._deref(r)
                    if base is None:
                        out.append(Finding(E.INSTANCE_REF_UNRESOLVED, path, r))
                        return
                    for k, v in base.get("properties", {}).items():
                        base_props.setdefault(k, v)
                    req.update(base.get("required", []) or [])
                own = schema.get("properties", {})
                for k in own:
                    if k in base_props:
                        out.append(Finding(E.SCHEMA_EXTENDS_CIRCULAR, path,
                                           f"property '{k}' redefines inherited property"))
                base_props.update(own)
                req.update(schema.get("required", []) or [])
                flat = {k: v for k, v in schema.items() if k not in ("$extends", "abstract")}
                if base_props:
                    flat["properties"] = base_props
                if req:
                    flat["required"] = sorted(req)
                schema = flat

        if schema.get("abstract") is True:
            out.append(Finding(E.INSTANCE_ABSTRACT_SCHEMA, path, None))
            return

        # instance-declared $uses pulls offered property groups in
        # (reference: instance_validator.py:321-324, 1211-1262)
        if uses_in_instance:
            schema = self._apply_uses(schema, value, out)
            value = {k: v for k, v in value.items() if k != "$uses"}

        handler = _TYPE_HANDLERS.get(stype)
        if handler is None:
            out.append(Finding(E.INSTANCE_TYPE_UNKNOWN, path, stype))
        else:
            handler(self, value, schema, path, out, depth)

        # extension keyword passes
        enable = (
            self.extended or self.is_validation_meta
            or "JSONStructureConditionalComposition" in self.exts
            or "JSONStructureValidation" in self.exts
            or (isinstance(schema.get("$uses"), list) and any(
                u in schema["$uses"]
                for u in ("JSONStructureConditionalComposition", "JSONStructureValidation")))
        )
        if self.is_extended_meta and any(k in schema for k in CONDITIONAL_KEYWORDS):
            # reference parity: under the extended metaschema every node
            # WITH a $uses list auto-gains all built-in addins (the
            # reference literally appends them, instance_validator.py:
            # 130-144), so requiring ConditionalComposition to be listed
            # EXPLICITLY falsely failed $uses:["JSONStructureUnits"]-style
            # schemas; the compiler's gate already checks list-ness only
            su = schema.get("$uses")
            if not isinstance(su, list):
                out.append(Finding(E.INSTANCE_CONDITIONAL_FAILED, path,
                                   "conditional composition not enabled"))
                return
        if enable:
            if (self.is_validation_meta
                    or "JSONStructureConditionalComposition" in self.exts
                    or (isinstance(schema.get("$uses"), list)
                        and "JSONStructureConditionalComposition" in schema["$uses"])):
                self._conditionals(value, schema, path, out, depth)
            if (self.is_validation_meta
                    or "JSONStructureValidation" in self.exts
                    or (isinstance(schema.get("$uses"), list)
                        and "JSONStructureValidation" in schema["$uses"])):
                self._addins(value, schema, path, out, depth)

        if "const" in schema and value != schema["const"]:
            out.append(Finding(E.INSTANCE_CONST_MISMATCH, path, value))
        if "enum" in schema and value not in schema["enum"]:
            out.append(Finding(E.INSTANCE_ENUM_MISMATCH, path, value))

    # -- conditional composition ------------------------------------------------
    def _inherit_uses(self, sub: dict) -> dict:
        if not isinstance(sub, dict):
            # non-dict branches are reported as SCHEMA_INVALID_TYPE by
            # _node's own guard — do not crash on dict('bogus') here
            return sub
        root_uses = self.root.get("$uses")
        if not root_uses:
            return sub
        merged = dict(sub)
        have = list(merged.get("$uses", []))
        for u in root_uses:
            if u not in have:
                have.append(u)
        merged["$uses"] = have
        return merged

    def _probe(self, value: Any, sub: dict, path: str, depth: int) -> list[Finding]:
        buf: list[Finding] = []
        self._node(value, self._inherit_uses(sub), path, buf, depth + 1)
        return buf

    def _conditionals(self, value, schema, path, out, depth) -> None:
        if "allOf" in schema:
            for i, sub in enumerate(schema["allOf"]):
                sub_errs = self._probe(value, sub, f"{path}/allOf[{i}]", depth)
                out.extend(sub_errs)
        if "anyOf" in schema:
            if not any(not self._probe(value, s, f"{path}/anyOf[{i}]", depth)
                       for i, s in enumerate(schema["anyOf"])):
                out.append(Finding(E.INSTANCE_ANY_OF_NONE_MATCHED, path, value))
        if "oneOf" in schema:
            hits = sum(1 for i, s in enumerate(schema["oneOf"])
                       if not self._probe(value, s, f"{path}/oneOf[{i}]", depth))
            if hits != 1:
                out.append(Finding(E.INSTANCE_ONE_OF_INVALID_COUNT, path, hits))
        if "not" in schema:
            if not self._probe(value, schema["not"], f"{path}/not", depth):
                out.append(Finding(E.INSTANCE_NOT_MATCHED, path, value))
        if "if" in schema:
            # semantics per the reference validate_instance path
            # (instance_validator.py:817-827): if-matched -> then,
            # if-failed -> else.  Both branches inherit the root's $uses
            # like every other composition branch — otherwise validation
            # keywords inside them (maximum, multipleOf, ...) silently
            # never fire.
            if_matched = not self._probe(value, schema["if"],
                                         f"{path}/if", depth)
            if if_matched:
                if "then" in schema:
                    self._node(value, self._inherit_uses(schema["then"]),
                               f"{path}/then", out, depth + 1)
            elif "else" in schema:
                self._node(value, self._inherit_uses(schema["else"]),
                           f"{path}/else", out, depth + 1)

    # -- validation addin keywords ------------------------------------------------
    def _addins(self, value, schema, path, out, depth) -> None:
        t = schema.get("type")
        if t in NUMERIC_ADDIN_TYPES:
            self._numeric_addins(value, schema, path, out)
        if t == "string":
            self._string_addins(value, schema, path, out)
        if t == "array":
            self._array_addins(value, schema, path, out, depth)
        if t == "object" and isinstance(value, dict):
            self._object_addins(value, schema, path, out, depth)
        if t == "map" and isinstance(value, dict):
            self._map_addins(value, schema, path, out, depth)

    def _numeric_addins(self, value, schema, path, out) -> None:
        # string-backed wide numerics (int64/uint64/int128/uint128/decimal)
        # carry digit strings; compare EXACT coerced values (int / Decimal),
        # never via float — doubles collapse adjacent values past 2^53
        # (reference parses then compares raw: instance_validator.py:372-411)
        v = _as_exact_number(value)
        if v is None:
            return  # malformed digits: the type handler already reported

        def cmp_fail(kw, code, op):
            if kw in schema:
                m = _as_exact_number(schema[kw])
                try:
                    if m is None or op(v, m):
                        out.append(Finding(code, path, value))
                except (TypeError, _decimal.InvalidOperation):
                    # Decimal('NaN') comparisons raise InvalidOperation, an
                    # ArithmeticError that escaped the TypeError catch and
                    # killed the task on one poison row; the reference
                    # records a cannot-compare error instead
                    out.append(Finding(code, path, value))

        cmp_fail("minimum", E.INSTANCE_NUMBER_MINIMUM, lambda a, m: a < m)
        cmp_fail("maximum", E.INSTANCE_NUMBER_MAXIMUM, lambda a, m: a > m)
        if "exclusiveMinimum" in schema:
            em = schema["exclusiveMinimum"]
            if isinstance(em, bool):
                if em and "minimum" in schema:
                    cmp_fail("minimum", E.INSTANCE_NUMBER_EXCLUSIVE_MINIMUM,
                             lambda a, m: a <= m)
            else:
                cmp_fail("exclusiveMinimum", E.INSTANCE_NUMBER_EXCLUSIVE_MINIMUM,
                         lambda a, m: a <= m)
        if "exclusiveMaximum" in schema:
            em = schema["exclusiveMaximum"]
            if isinstance(em, bool):
                if em and "maximum" in schema:
                    cmp_fail("maximum", E.INSTANCE_NUMBER_EXCLUSIVE_MAXIMUM,
                             lambda a, m: a >= m)
            else:
                cmp_fail("exclusiveMaximum", E.INSTANCE_NUMBER_EXCLUSIVE_MAXIMUM,
                         lambda a, m: a >= m)
        if "multipleOf" in schema:
            # quotient-rounding tolerance, NOT modulo
            # (reference: instance_validator.py:879-888)
            try:
                q = float(v) / float(_as_exact_number(schema["multipleOf"]))
                if abs(q - round(q)) > 1e-10:
                    out.append(Finding(E.INSTANCE_NUMBER_MULTIPLE_OF, path, value))
            except (TypeError, ValueError, ZeroDivisionError, OverflowError):
                out.append(Finding(E.INSTANCE_NUMBER_MULTIPLE_OF, path, value))

    def _string_addins(self, value, schema, path, out) -> None:
        if "minLength" in schema:
            try:
                if len(value) < schema["minLength"]:
                    out.append(Finding(E.INSTANCE_STRING_MIN_LENGTH, path, value))
            except TypeError:
                out.append(Finding(E.INSTANCE_STRING_MIN_LENGTH, path, value))
        if "maxLength" in schema:
            try:
                if len(value) > schema["maxLength"]:
                    out.append(Finding(E.INSTANCE_STRING_MAX_LENGTH, path, value))
            except TypeError:
                out.append(Finding(E.INSTANCE_STRING_MAX_LENGTH, path, value))
        if "pattern" in schema:
            # unanchored search semantics (reference: instance_validator.py:904-910)
            try:
                if not re.search(schema["pattern"], value):
                    out.append(Finding(E.INSTANCE_STRING_PATTERN_MISMATCH, path, value))
            except (re.error, TypeError):
                out.append(Finding(E.INSTANCE_STRING_PATTERN_MISMATCH, path, value))
        if "format" in schema and isinstance(value, str):
            fmt = schema["format"]
            ok = True
            try:
                if fmt == "email":
                    ok = "@" in value and bool(RX_EMAIL.match(value))
                elif fmt == "ipv4":
                    parts = value.split(".")
                    ok = len(parts) == 4 and all(0 <= int(p) <= 255 for p in parts)
                elif fmt == "ipv6":
                    ok = bool(RX_IPV6.match(value))
                elif fmt == "uri":
                    ok = bool(urlparse(value).scheme)
                elif fmt == "hostname":
                    ok = bool(RX_HOSTNAME.match(value))
            except (ValueError, TypeError):
                ok = False
            if not ok:
                out.append(Finding(E.INSTANCE_FORMAT_INVALID, path, value))

    def _array_addins(self, value, schema, path, out, depth) -> None:
        if not isinstance(value, list):
            return
        if "minItems" in schema and len(value) < schema["minItems"]:
            out.append(Finding(E.INSTANCE_MIN_ITEMS, path, len(value)))
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            out.append(Finding(E.INSTANCE_MAX_ITEMS, path, len(value)))
        if schema.get("uniqueItems") is True:
            canon = [_canon(x) for x in value]
            if len(canon) != len(set(canon)):
                out.append(Finding(E.INSTANCE_SET_DUPLICATE, path, None))
        if "contains" in schema:
            sub = RowChecker(schema["contains"], extended=self.extended)
            n = sum(1 for item in value if sub.is_valid(item))
            if n == 0:
                out.append(Finding(E.INSTANCE_CONTAINS_NONE, path, None))
            if "minContains" in schema and n < schema["minContains"]:
                out.append(Finding(E.INSTANCE_MIN_CONTAINS, path, n))
            if "maxContains" in schema and n > schema["maxContains"]:
                out.append(Finding(E.INSTANCE_MAX_CONTAINS, path, n))

    def _object_addins(self, value, schema, path, out, depth) -> None:
        if "minProperties" in schema and len(value) < schema["minProperties"]:
            out.append(Finding(E.INSTANCE_MIN_PROPERTIES, path, len(value)))
        if "maxProperties" in schema and len(value) > schema["maxProperties"]:
            out.append(Finding(E.INSTANCE_MAX_PROPERTIES, path, len(value)))
        if isinstance(schema.get("patternProperties"), dict):
            for pat, sub in schema["patternProperties"].items():
                try:
                    rx = re.compile(pat)
                except re.error:
                    out.append(Finding(E.SCHEMA_PATTERN_INVALID, path, pat))
                    continue
                for k, v in value.items():
                    if rx.search(k):
                        self._node(v, sub, f"{path}/{k}", out, depth + 1)
        if "propertyNames" in schema:
            pn = schema["propertyNames"]
            if not isinstance(pn, dict) or pn.get("type") != "string":
                out.append(Finding(E.SCHEMA_KEYWORD_INVALID_TYPE, path, "propertyNames"))
            else:
                for k in value:
                    self._node(k, pn, f"{path}/propertyName({k})", out, depth + 1)
        if isinstance(schema.get("dependentRequired"), dict):
            for trigger, deps in schema["dependentRequired"].items():
                if trigger in value and isinstance(deps, list):
                    for d in deps:
                        if d not in value:
                            out.append(Finding(E.INSTANCE_DEPENDENT_REQUIRED,
                                               path, f"{trigger} -> {d}"))

    def _map_addins(self, value, schema, path, out, depth) -> None:
        if "minEntries" in schema and len(value) < schema["minEntries"]:
            out.append(Finding(E.INSTANCE_MAP_MIN_ENTRIES, path, len(value)))
        if "maxEntries" in schema and len(value) > schema["maxEntries"]:
            out.append(Finding(E.INSTANCE_MAP_MAX_ENTRIES, path, len(value)))
        if isinstance(schema.get("patternKeys"), dict):
            for pat, sub in schema["patternKeys"].items():
                try:
                    rx = re.compile(pat)
                except re.error:
                    out.append(Finding(E.SCHEMA_PATTERN_INVALID, path, pat))
                    continue
                for k, v in value.items():
                    if rx.search(k):
                        self._node(v, sub, f"{path}/{k}", out, depth + 1)
        if "keyNames" in schema:
            kn = schema["keyNames"]
            if not isinstance(kn, dict) or kn.get("type") != "string":
                out.append(Finding(E.SCHEMA_KEYWORD_INVALID_TYPE, path, "keyNames"))
            else:
                kn_schema = dict(kn)
                uses = list(kn_schema.get("$uses", []))
                if "JSONStructureValidation" not in uses:
                    uses.append("JSONStructureValidation")
                kn_schema["$uses"] = uses
                sub = RowChecker(kn_schema, extended=True)
                for k in value:
                    if not sub.is_valid(k):
                        out.append(Finding(E.INSTANCE_MAP_KEY_INVALID, path, k))

    # -- $uses / $offers -----------------------------------------------------------
    def _apply_uses(self, schema: dict, value: dict, out: list[Finding]) -> dict:
        uses = value.get("$uses")
        if not uses:
            return schema
        if not isinstance(uses, list):
            uses = [uses]
        offers = self.root.get("$offers", {})
        merged = dict(schema)
        merged["properties"] = dict(merged.get("properties", {}))
        for u in uses:
            if not isinstance(u, str):
                # unhashable member ({"a": 1}) would raise TypeError inside
                # the set/dict membership tests below — the reference
                # crashes here (instance_validator.py:1211 `u in offers`);
                # one poison row must not kill a distributed task, so the
                # engine reports it as not-offered instead (same policy as
                # the r4 NaN-decimal fix)
                out.append(Finding(E.INSTANCE_USES_NOT_OFFERED, "#", u))
                continue
            if u in BUILTIN_ADDINS:
                continue
            if u not in offers:
                out.append(Finding(E.INSTANCE_USES_NOT_OFFERED, "#", u))
                continue
            addin = offers[u]
            groups = addin if isinstance(addin, list) else [addin]
            for g in groups:
                node = g
                if isinstance(g, str):
                    node = self._deref(g)
                elif isinstance(g, dict) and "$ref" in g:
                    node = self._deref(g["$ref"])
                if not isinstance(node, dict):
                    continue
                for k, v in node.get("properties", {}).items():
                    if k in merged["properties"]:
                        out.append(Finding(E.INSTANCE_USES_NOT_OFFERED, "#",
                                           f"add-in property '{k}' conflicts"))
                    merged["properties"][k] = v
        return merged


def _as_exact_number(x):
    """Coerce a JSON value (native number or digit string) to an exactly
    comparable Python number; None when not numeric. int/Decimal/float
    cross-compare exactly in Python — no double rounding."""
    if isinstance(x, bool):
        return int(x)  # reference quirk: bool is int for numeric compares
    if isinstance(x, (int, float)):
        return x
    if isinstance(x, str):
        import decimal

        try:
            return int(x)
        except ValueError:
            pass
        try:
            return decimal.Decimal(x)
        except decimal.InvalidOperation:
            return None
    return None


# -- per-type handlers --------------------------------------------------------

def _h_any(self, value, schema, path, out, depth):
    return


def _h_string(self, value, schema, path, out, depth):
    if not isinstance(value, str):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_number(self, value, schema, path, out, depth):
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_boolean(self, value, schema, path, out, depth):
    if not isinstance(value, bool):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_null(self, value, schema, path, out, depth):
    if value is not None:
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_smallint(self, value, schema, path, out, depth):
    t = schema["type"] if isinstance(schema.get("type"), str) else "int32"
    lo, hi = INT_RANGES[t]
    if isinstance(value, bool) or not isinstance(value, int):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
    elif not (lo <= value <= hi):
        out.append(Finding(E.INSTANCE_NUMBER_OUT_OF_RANGE, path, value))


def _h_bigint(self, value, schema, path, out, depth):
    t = schema["type"]
    lo, hi = BIGINT_RANGES[t]
    if not isinstance(value, str):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    try:
        n = int(value)
    except ValueError:
        out.append(Finding(E.INSTANCE_NUMBER_FORMAT_INVALID, path, value))
        return
    if not (lo <= n <= hi):
        out.append(Finding(E.INSTANCE_NUMBER_OUT_OF_RANGE, path, value))


def _h_float(self, value, schema, path, out, depth):
    if not isinstance(value, (int, float)) or isinstance(value, bool):
        # reference accepts bool here (isinstance(bool, int) is True); we
        # mirror that exactly for differential parity:
        if not isinstance(value, (int, float)):
            out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_decimal(self, value, schema, path, out, depth):
    if not isinstance(value, str):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    try:
        float(value)
    except ValueError:
        out.append(Finding(E.INSTANCE_DECIMAL_FORMAT_INVALID, path, value))


def _rx_handler(rx: re.Pattern, code: str):
    def h(self, value, schema, path, out, depth):
        if not isinstance(value, str) or not rx.match(value):
            out.append(Finding(code, path, value))
    return h


def _h_uuid(self, value, schema, path, out, depth):
    if not isinstance(value, str):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    try:
        _uuid.UUID(value)
    except ValueError:
        out.append(Finding(E.INSTANCE_UUID_FORMAT_INVALID, path, value))


def _h_uri(self, value, schema, path, out, depth):
    if not isinstance(value, str):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
    elif not urlparse(value).scheme:
        out.append(Finding(E.INSTANCE_URI_FORMAT_INVALID, path, value))


def _h_binary(self, value, schema, path, out, depth):
    if not isinstance(value, (str, bytes, bytearray)):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))


def _h_object(self, value, schema, path, out, depth):
    props = schema.get("properties", {})
    if "properties" in schema and (not isinstance(props, dict)
                                   or (len(props) == 0 and "$extends" not in schema)):
        out.append(Finding(E.SCHEMA_PROPERTIES_NOT_OBJECT, path, None))
        return
    if not isinstance(value, dict):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    for r in schema.get("required", []):
        if r not in value:
            out.append(Finding(E.INSTANCE_REQUIRED_PROPERTY_MISSING, f"{path}/{r}", r))
    for name, sub in props.items():
        if name in value:
            self._node(value[name], sub, f"{path}/{name}", out, depth + 1)
    if "additionalProperties" in schema:
        addl = schema["additionalProperties"]
        reserved = {"$schema", "$uses"}
        for k in value:
            if k in props or (path == "#" and k in reserved):
                continue
            if addl is False:
                out.append(Finding(E.INSTANCE_ADDITIONAL_PROPERTY, f"{path}/{k}", k))
            elif isinstance(addl, dict):
                self._node(value[k], addl, f"{path}/{k}", out, depth + 1)
    if "has" in schema:
        if not any(not self._probe_plain(v, schema["has"], depth) for v in value.values()):
            out.append(Finding(E.INSTANCE_HAS_NO_MATCH, path, None))
    if isinstance(schema.get("dependentRequired"), dict):
        for trigger, deps in schema["dependentRequired"].items():
            if trigger in value and isinstance(deps, list):
                for d in deps:
                    if d not in value:
                        out.append(Finding(E.INSTANCE_DEPENDENT_REQUIRED,
                                           path, f"{trigger} -> {d}"))


def _h_array(self, value, schema, path, out, depth):
    if not isinstance(value, list):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    items = schema.get("items")
    if items:
        for i, item in enumerate(value):
            self._node(item, items, f"{path}[{i}]", out, depth + 1)


def _h_set(self, value, schema, path, out, depth):
    if not isinstance(value, list):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    canon = [_canon(x) for x in value]
    if len(canon) != len(set(canon)):
        out.append(Finding(E.INSTANCE_SET_DUPLICATE, path, None))
    items = schema.get("items")
    if items:
        for i, item in enumerate(value):
            self._node(item, items, f"{path}[{i}]", out, depth + 1)


def _h_map(self, value, schema, path, out, depth):
    if not isinstance(value, dict):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    values_schema = schema.get("values")
    if values_schema:
        for k, v in value.items():
            self._node(v, values_schema, f"{path}/{k}", out, depth + 1)


def _h_tuple(self, value, schema, path, out, depth):
    if not isinstance(value, list):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    order = schema.get("tuple")
    props = schema.get("properties", {})
    if order is None or not isinstance(order, list):
        out.append(Finding(E.SCHEMA_TUPLE_MISSING_ORDER, path, None))
        return
    missing = [n for n in order if n not in props]
    for n in missing:
        out.append(Finding(E.SCHEMA_TUPLE_PROPERTY_NOT_DEFINED, path, n))
    if len(value) != len(order):
        out.append(Finding(E.INSTANCE_TUPLE_LENGTH, path, len(value)))
    elif not missing:
        for i, name in enumerate(order):
            self._node(value[i], props[name], f"{path}/{name}", out, depth + 1)


def _h_choice(self, value, schema, path, out, depth):
    if not isinstance(value, dict):
        out.append(Finding(E.INSTANCE_TYPE_MISMATCH, path, value))
        return
    choices = schema.get("choices", {})
    selector = schema.get("selector")
    if schema.get("$extends") is None:
        if len(value) != 1:
            out.append(Finding(E.INSTANCE_CHOICE_INVALID, path, list(value)))
            return
        key, inner = next(iter(value.items()))
        if key not in choices:
            out.append(Finding(E.INSTANCE_CHOICE_INVALID, path, key))
        else:
            self._node(inner, choices[key], f"{path}/{key}", out, depth + 1)
    else:
        if selector is None:
            out.append(Finding(E.INSTANCE_CHOICE_INVALID, path, "missing selector"))
            return
        sel = value.get(selector)
        if not isinstance(sel, str) or sel not in choices:
            out.append(Finding(E.INSTANCE_CHOICE_INVALID, path, sel))
            return
        rest = {k: v for k, v in value.items() if k != selector}
        self._node(rest, choices[sel], path, out, depth + 1)


def _probe_plain(self, value, sub, depth):
    buf: list[Finding] = []
    self._node(value, sub, "#", buf, depth + 1)
    return buf


RowChecker._probe_plain = _probe_plain

_TYPE_HANDLERS = {
    "any": _h_any,
    "string": _h_string,
    "number": _h_number,
    "boolean": _h_boolean,
    "null": _h_null,
    "int8": _h_smallint, "uint8": _h_smallint, "int16": _h_smallint,
    "uint16": _h_smallint, "int32": _h_smallint, "integer": _h_smallint,
    "uint32": _h_smallint,
    "int64": _h_bigint, "uint64": _h_bigint, "int128": _h_bigint, "uint128": _h_bigint,
    "float8": _h_float, "float": _h_float, "double": _h_float,
    "decimal": _h_decimal,
    "date": _rx_handler(RX_DATE, E.INSTANCE_DATE_FORMAT_INVALID),
    "datetime": _rx_handler(RX_DATETIME, E.INSTANCE_DATETIME_FORMAT_INVALID),
    "time": _rx_handler(RX_TIME, E.INSTANCE_TIME_FORMAT_INVALID),
    "duration": _rx_handler(RX_DURATION, E.INSTANCE_DURATION_FORMAT_INVALID),
    "uuid": _h_uuid,
    "uri": _h_uri,
    "binary": _h_binary,
    "jsonpointer": _rx_handler(RX_JSONPOINTER, E.INSTANCE_JSONPOINTER_FORMAT_INVALID),
    "object": _h_object,
    "array": _h_array,
    "set": _h_set,
    "map": _h_map,
    "tuple": _h_tuple,
    "choice": _h_choice,
}
