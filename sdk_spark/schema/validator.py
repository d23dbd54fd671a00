"""Structural validation of JSON Structure schema documents (driver-side).

This is the engine's compiler *front end*: before a schema is lowered to a
Catalyst plan, the schema document itself must be well-formed.  The checks
re-implement the reference's schema validator semantics
(reference: python/src/json_structure/schema_validator.py:176-238 and the
per-keyword checks at :489-1119) as a fresh, table-driven walker.  Pure
Python — schemas are tiny driver-side objects; nothing here touches Spark.
"""

from __future__ import annotations

import json
import re
from typing import Any

from .. import errors as E
from ..errors import Issue, Severity

ABS_URI = re.compile(r"^[a-zA-Z][a-zA-Z0-9+\-.]*://")
PRIMITIVES = {
    "string", "number", "integer", "boolean", "null", "int8", "uint8",
    "int16", "uint16", "int32", "uint32", "int64", "uint64", "int128",
    "uint128", "float8", "float", "double", "decimal", "date", "datetime",
    "time", "duration", "uuid", "uri", "binary", "jsonpointer",
}
COMPOUNDS = {"object", "array", "set", "map", "tuple", "choice", "any"}
COMPOSITION = {"allOf", "anyOf", "oneOf", "not", "if", "then", "else"}
NUMERIC_KW = {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf"}
STRING_KW = {"minLength", "maxLength", "pattern", "format", "contentEncoding", "contentMediaType"}
ARRAY_KW = {"minItems", "maxItems", "uniqueItems", "contains", "minContains", "maxContains"}
OBJECT_KW = {"minProperties", "maxProperties", "minEntries", "maxEntries",
             "dependentRequired", "patternProperties", "patternKeys",
             "propertyNames", "keyNames", "has", "default"}
ALL_VALIDATION_KW = NUMERIC_KW | STRING_KW | ARRAY_KW | OBJECT_KW
NUMERIC_TYPES = {
    "number", "integer", "float", "double", "decimal", "float8",
    "int8", "uint8", "int16", "uint16", "int32", "uint32",
    "int64", "uint64", "int128", "uint128",
}
STRING_BACKED = {"int64", "uint64", "int128", "uint128", "decimal"}
VALID_FORMATS = {
    "ipv4", "ipv6", "email", "idn-email", "hostname", "idn-hostname",
    "iri", "iri-reference", "uri-template", "relative-json-pointer", "regex",
}
KNOWN_EXTENSIONS = {
    "JSONStructureImport", "JSONStructureAlternateNames", "JSONStructureUnits",
    "JSONStructureConditionalComposition", "JSONStructureValidation",
}


class SchemaChecker:
    """Validates a schema document; collects :class:`Issue` errors/warnings."""

    def __init__(self, extended: bool = False, allow_dollar: bool = False,
                 warn_on_unused_extension_keywords: bool = True):
        self.extended = extended
        self.warn_unused = warn_on_unused_extension_keywords
        self.ident = re.compile(r"^[A-Za-z_$][A-Za-z0-9_$]*$" if allow_dollar
                                else r"^[A-Za-z_][A-Za-z0-9_]*$")
        self.errors: list[Issue] = []
        self.warnings: list[Issue] = []
        self.doc: Any = None
        self.enabled: set[str] = set()
        self._extends_stack: set[str] = set()

    # -- helpers -------------------------------------------------------------
    def _err(self, msg: str, path: str = "#", code: str = E.SCHEMA_ERROR) -> None:
        self.errors.append(Issue(code, msg, path))

    def _warn(self, msg: str, path: str, code: str) -> None:
        self.warnings.append(Issue(code, msg, path, Severity.WARNING))

    def _deref(self, pointer: str) -> Any:
        if not isinstance(pointer, str) or not pointer.startswith("#"):
            return None
        if pointer == "#":
            return self.doc
        node = self.doc
        for seg in pointer.lstrip("#").split("/"):
            if seg == "":
                continue
            seg = seg.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict) and seg in node:
                node = node[seg]
            else:
                return None
        return node

    def _check_pointer(self, pointer: Any, path: str) -> None:
        if not isinstance(pointer, str):
            self._err("JSON Pointer must be a string.", path, E.SCHEMA_REF_NOT_FOUND)
            return
        if not pointer.startswith("#"):
            self._err("JSON Pointer must start with '#'.", path, E.SCHEMA_REF_NOT_FOUND)
            return
        if self._deref(pointer) is None and pointer != "#":
            self._err(f"JSON Pointer '{pointer}' does not resolve.", path,
                      E.SCHEMA_REF_NOT_FOUND)

    # -- entry point -----------------------------------------------------------
    def validate(self, doc: Any) -> list[Issue]:
        self.errors, self.warnings = [], []
        self.doc = doc
        self._extends_stack = set()
        # reset per document: a checker reused across documents must not
        # leak extension enablement from an earlier $uses into a later
        # document that never enabled the extension
        self.enabled = set()
        if not isinstance(doc, dict):
            self._err("Schema document root must be a JSON object.", "#",
                      E.SCHEMA_INVALID_TYPE)
            return self.errors

        if self.extended:
            uri = doc.get("$schema", "")
            if "validation" in uri:
                self.enabled.update(
                    ("JSONStructureConditionalComposition", "JSONStructureValidation"))
            uses = doc.get("$uses", [])
            if isinstance(uses, list):
                self.enabled.update(u for u in uses if u in KNOWN_EXTENSIONS)

        if "$id" not in doc:
            self._err("Missing required '$id' at root.", "#", E.SCHEMA_ROOT_MISSING_ID)
        if "type" in doc and "name" not in doc:
            self._err("Root schema with 'type' must have 'name'.", "#",
                      E.SCHEMA_ROOT_MISSING_NAME)
        for kw in ("$schema", "$id"):
            if kw in doc:
                v = doc[kw]
                if not isinstance(v, str) or not ABS_URI.search(v):
                    self._err(f"'{kw}' must be an absolute URI.", f"#/{kw}")
        if "$uses" in doc:
            self._check_uses(doc["$uses"], "#/$uses")
        if "type" in doc and "$root" in doc:
            self._err("Root cannot have both 'type' and '$root'.", "#",
                      E.SCHEMA_ROOT_CONFLICT)
        if "type" in doc:
            self._schema(doc, "#", is_root=True)
        if "$root" in doc:
            self._check_pointer(doc["$root"], "#/$root")
        if "definitions" in doc:
            if not isinstance(doc["definitions"], dict):
                self._err("definitions must be an object.", "#/definitions",
                          E.SCHEMA_KEYWORD_INVALID_TYPE)
            else:
                self._namespace(doc["definitions"], "#/definitions")
        if "$offers" in doc:
            self._check_offers(doc["$offers"], "#/$offers")
        if self.extended and "type" not in doc:
            self._composition(doc, "#")
        has_any_root = ("type" in doc or "$root" in doc
                        or (self.extended and any(k in doc for k in COMPOSITION)))
        if not has_any_root:
            self._err("Document needs 'type', '$root', or composition at root.",
                      "#", E.SCHEMA_ROOT_MISSING_TYPE)
        return self.errors

    # -- $uses / $offers -------------------------------------------------------
    def _check_uses(self, uses: Any, path: str) -> None:
        if not isinstance(uses, list):
            self._err("$uses must be an array.", path, E.SCHEMA_KEYWORD_INVALID_TYPE)
            return
        for i, ext in enumerate(uses):
            if not isinstance(ext, str):
                self._err(f"$uses[{i}] must be a string.", f"{path}[{i}]",
                          E.SCHEMA_KEYWORD_INVALID_TYPE)
            elif self.extended and ext not in KNOWN_EXTENSIONS:
                self._err(f"Unknown extension '{ext}'.", f"{path}[{i}]",
                          E.SCHEMA_USES_UNKNOWN_EXTENSION)

    def _check_offers(self, offers: Any, path: str) -> None:
        if not isinstance(offers, dict):
            self._err("$offers must be an object.", path, E.SCHEMA_KEYWORD_INVALID_TYPE)
            return
        for name, val in offers.items():
            if isinstance(val, str):
                self._check_pointer(val, f"{path}/{name}")
            elif isinstance(val, list):
                for i, p in enumerate(val):
                    self._check_pointer(p, f"{path}/{name}[{i}]")
            else:
                self._err(f"$offers/{name} must be a pointer or list of pointers.",
                          f"{path}/{name}", E.SCHEMA_KEYWORD_INVALID_TYPE)

    # -- namespaces --------------------------------------------------------------
    def _namespace(self, node: Any, path: str) -> None:
        if not isinstance(node, dict):
            self._err(f"{path} must be an object.", path, E.SCHEMA_KEYWORD_INVALID_TYPE)
            return
        for k, v in node.items():
            sub = f"{path}/{k}"
            if isinstance(v, dict) and ("type" in v or "$ref" in v
                                        or (self.extended and any(c in v for c in COMPOSITION))):
                self._schema(v, sub, definition_path=sub)
            elif isinstance(v, dict):
                self._namespace(v, sub)
            else:
                self._err(f"{sub} is neither a namespace nor a schema.", sub,
                          E.SCHEMA_INVALID_TYPE)

    # -- schema objects ------------------------------------------------------------
    def _schema(self, node: Any, path: str, is_root: bool = False,
                definition_path: str | None = None) -> None:
        if not isinstance(node, dict):
            self._err(f"{path} must be an object to be a schema.", path,
                      E.SCHEMA_INVALID_TYPE)
            return
        if self.extended:
            self._composition(node, path)
        if "name" in node:
            if not isinstance(node["name"], str) or not self.ident.match(node["name"]):
                self._err("'name' must match the identifier pattern.",
                          f"{path}/name", E.SCHEMA_NAME_INVALID)
        if "abstract" in node and not isinstance(node["abstract"], bool):
            self._err("'abstract' must be boolean.", f"{path}/abstract",
                      E.SCHEMA_KEYWORD_INVALID_TYPE)
        if "$extends" in node:
            self._extends(node["$extends"], f"{path}/$extends")
        if "$ref" in node:
            # bare $ref is not permitted; only type: { $ref } is
            self._err("'$ref' only permitted inside 'type'.", f"{path}/$ref",
                      E.SCHEMA_REF_NOT_IN_TYPE)
            return

        has_type = "type" in node
        has_comp = self.extended and any(k in node for k in COMPOSITION)
        if not has_type and not has_comp:
            self._err("Missing required 'type'.", path, E.SCHEMA_MISSING_TYPE)
            return

        if has_type:
            t = node["type"]
            if isinstance(t, list):
                if not t:
                    self._err("Type union cannot be empty.", f"{path}/type",
                              E.SCHEMA_KEYWORD_EMPTY)
                for i, item in enumerate(t):
                    self._union_item(item, f"{path}/type[{i}]")
            elif isinstance(t, dict):
                if "$ref" in t:
                    ref = t["$ref"]
                    self._check_pointer(ref, f"{path}/type/$ref")
                    if (len(node) == 1 and len(t) == 1 and definition_path
                            and ref == definition_path):
                        self._err(f"Circular reference: {ref}", f"{path}/type/$ref",
                                  E.SCHEMA_REF_CIRCULAR)
                        return
                elif "type" in t or "properties" in t:
                    self._schema(t, f"{path}/type(inline)")
                else:
                    self._err("Type dict must carry '$ref' or be a schema.",
                              f"{path}/type", E.SCHEMA_TYPE_INVALID)
            elif isinstance(t, str):
                if t not in PRIMITIVES and t not in COMPOUNDS:
                    self._err(f"Unknown type '{t}'.", f"{path}/type",
                              E.SCHEMA_TYPE_INVALID)
                elif t == "object":
                    self._object(node, path)
                elif t in ("array", "set"):
                    self._items_required(node, path)
                elif t == "map":
                    self._map(node, path)
                elif t == "tuple":
                    self._tuple(node, path)
                elif t == "choice":
                    self._choice(node, path)
            else:
                self._err("Type must be string, list, or dict with $ref.",
                          f"{path}/type", E.SCHEMA_TYPE_INVALID)

        if self.extended and has_type:
            self._extension_keywords(node, path)

        self._common_keywords(node, path)

    def _common_keywords(self, node: dict, path: str) -> None:
        t = node.get("type")
        if "required" in node:
            req = node["required"]
            if isinstance(t, str) and t != "object":
                self._err("'required' only valid on object schemas.",
                          f"{path}/required", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
            if not isinstance(req, list):
                self._err("'required' must be an array.", f"{path}/required",
                          E.SCHEMA_REQUIRED_NOT_ARRAY)
            else:
                for i, item in enumerate(req):
                    if not isinstance(item, str):
                        self._err(f"'required[{i}]' must be a string.",
                                  f"{path}/required[{i}]", E.SCHEMA_REQUIRED_ITEM_NOT_STRING)
                props = node.get("properties")
                if isinstance(props, dict):
                    for i, item in enumerate(req):
                        if isinstance(item, str) and item not in props:
                            self._err(f"'required' names undefined property '{item}'.",
                                      f"{path}/required[{i}]",
                                      E.SCHEMA_REQUIRED_PROPERTY_NOT_DEFINED)
        if "additionalProperties" in node and isinstance(t, str) and t != "object":
            self._err("'additionalProperties' only valid on object schemas.",
                      f"{path}/additionalProperties", E.SCHEMA_ADDITIONAL_PROPERTIES_INVALID)
        if "enum" in node:
            ev = node["enum"]
            if not isinstance(ev, list):
                self._err("'enum' must be an array.", f"{path}/enum", E.SCHEMA_ENUM_NOT_ARRAY)
            else:
                if not ev:
                    self._err("'enum' cannot be empty.", f"{path}/enum", E.SCHEMA_ENUM_EMPTY)
                seen: set[str] = set()
                for i, item in enumerate(ev):
                    try:
                        key = json.dumps(item, sort_keys=True)
                    except (TypeError, ValueError):
                        continue
                    if key in seen:
                        self._err(f"'enum' has duplicate at index {i}.",
                                  f"{path}/enum[{i}]", E.SCHEMA_ENUM_DUPLICATE_VALUE)
                    seen.add(key)
            if isinstance(t, str) and t in COMPOUNDS:
                self._err("'enum' not allowed on compound types.", f"{path}/enum",
                          E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
        if "const" in node and isinstance(t, str) and t in COMPOUNDS:
            self._err("'const' not allowed on compound types.", f"{path}/const",
                      E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)

    # -- compound-type structure -------------------------------------------------
    def _object(self, node: dict, path: str) -> None:
        if "properties" not in node and "$extends" not in node:
            self._err("Object schema needs 'properties' (or $extends).",
                      f"{path}/properties", E.SCHEMA_PROPERTIES_NOT_OBJECT)
            return
        props = node.get("properties")
        if props is None:
            return
        if not isinstance(props, dict):
            self._err("'properties' must be an object.", f"{path}/properties",
                      E.SCHEMA_PROPERTIES_NOT_OBJECT)
            return
        for name, sub in props.items():
            if not self.ident.match(name):
                self._err(f"Property key '{name}' is not a valid identifier.",
                          f"{path}/properties/{name}", E.SCHEMA_NAME_INVALID)
            if isinstance(sub, dict):
                self._schema(sub, f"{path}/properties/{name}")
            else:
                self._err(f"Property '{name}' must be a schema object.",
                          f"{path}/properties/{name}", E.SCHEMA_INVALID_TYPE)

    def _items_required(self, node: dict, path: str) -> None:
        if "items" not in node:
            self._err("Array/set schema needs 'items'.", f"{path}/items",
                      E.SCHEMA_ARRAY_MISSING_ITEMS)
        elif not isinstance(node["items"], dict):
            self._err("'items' must be a schema object.", f"{path}/items",
                      E.SCHEMA_INVALID_TYPE)
        else:
            self._schema(node["items"], f"{path}/items")

    def _map(self, node: dict, path: str) -> None:
        if "values" not in node:
            self._err("Map schema needs 'values'.", f"{path}/values",
                      E.SCHEMA_MAP_MISSING_VALUES)
        elif not isinstance(node["values"], dict):
            self._err("'values' must be a schema object.", f"{path}/values",
                      E.SCHEMA_INVALID_TYPE)
        else:
            self._schema(node["values"], f"{path}/values")

    def _tuple(self, node: dict, path: str) -> None:
        if "name" not in node:
            self._err("Tuple schema needs 'name'.", f"{path}/name",
                      E.SCHEMA_TUPLE_MISSING_DEFINITION)
        props = node.get("properties")
        if props is None:
            self._err("Tuple schema needs 'properties'.", f"{path}/properties",
                      E.SCHEMA_TUPLE_MISSING_DEFINITION)
        elif not isinstance(props, dict):
            self._err("'properties' must be an object.", f"{path}/properties",
                      E.SCHEMA_PROPERTIES_NOT_OBJECT)
        else:
            for name, sub in props.items():
                if not self.ident.match(name):
                    self._err(f"Tuple property key '{name}' invalid.",
                              f"{path}/properties/{name}", E.SCHEMA_NAME_INVALID)
                if isinstance(sub, dict):
                    self._schema(sub, f"{path}/properties/{name}")
                else:
                    self._err(f"Tuple property '{name}' must be a schema.",
                              f"{path}/properties/{name}", E.SCHEMA_INVALID_TYPE)
        order = node.get("tuple")
        if order is None:
            self._err("Tuple schema needs the 'tuple' order array.",
                      f"{path}/tuple", E.SCHEMA_TUPLE_MISSING_ORDER)
        elif not isinstance(order, list):
            self._err("'tuple' must be an array of property names.",
                      f"{path}/tuple", E.SCHEMA_TUPLE_MISSING_ORDER)
        else:
            for i, el in enumerate(order):
                if not isinstance(el, str):
                    self._err(f"'tuple[{i}]' must be a string.",
                              f"{path}/tuple[{i}]", E.SCHEMA_KEYWORD_INVALID_TYPE)
                elif isinstance(props, dict) and el not in props:
                    self._err(f"'tuple[{i}]' ('{el}') not in properties.",
                              f"{path}/tuple[{i}]", E.SCHEMA_TUPLE_PROPERTY_NOT_DEFINED)

    def _choice(self, node: dict, path: str) -> None:
        if "choices" not in node:
            self._err("Choice schema needs 'choices'.", f"{path}/choices",
                      E.SCHEMA_CHOICE_MISSING_CHOICES)
        elif not isinstance(node["choices"], dict):
            self._err("'choices' must be an object.", f"{path}/choices",
                      E.SCHEMA_CHOICES_NOT_OBJECT)
        else:
            for name, sub in node["choices"].items():
                if isinstance(sub, dict):
                    self._schema(sub, f"{path}/choices/{name}")
                else:
                    self._err(f"Choice '{name}' must be a schema.",
                              f"{path}/choices/{name}", E.SCHEMA_INVALID_TYPE)
        if "selector" in node and not isinstance(node["selector"], str):
            self._err("'selector' must be a string.", f"{path}/selector",
                      E.SCHEMA_KEYWORD_INVALID_TYPE)

    # -- unions ---------------------------------------------------------------
    def _union_item(self, item: Any, path: str) -> None:
        if isinstance(item, str):
            if item not in PRIMITIVES and item not in COMPOUNDS:
                self._err(f"'{item}' is not a valid type name.", path,
                          E.SCHEMA_TYPE_INVALID)
            elif item in COMPOUNDS:
                self._err(f"Inline compound '{item}' not permitted in union; use $ref.",
                          path, E.SCHEMA_TYPE_INVALID)
        elif isinstance(item, dict):
            if "$ref" not in item:
                self._err("Inline compound definitions not allowed in union.",
                          path, E.SCHEMA_TYPE_INVALID)
            else:
                self._check_pointer(item["$ref"], f"{path}/$ref")
        else:
            self._err("Union item must be a type name or {$ref}.", path,
                      E.SCHEMA_TYPE_INVALID)

    # -- $extends cycles ----------------------------------------------------------
    def _extends(self, value: Any, path: str) -> None:
        refs: list[tuple[str, str]] = []
        if isinstance(value, str):
            refs.append((value, path))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, str):
                    refs.append((item, f"{path}[{i}]"))
                else:
                    self._err("'$extends' items must be pointer strings.",
                              f"{path}[{i}]", E.SCHEMA_KEYWORD_INVALID_TYPE)
        else:
            self._err("'$extends' must be a pointer or list of pointers.",
                      path, E.SCHEMA_KEYWORD_INVALID_TYPE)
            return
        for ref, rpath in refs:
            if not ref.startswith("#"):
                continue
            if ref in self._extends_stack:
                self._err(f"Circular $extends: {ref}", rpath, E.SCHEMA_EXTENDS_CIRCULAR)
                continue
            self._extends_stack.add(ref)
            target = self._deref(ref)
            if target is None:
                self._err(f"$extends target '{ref}' not found.", rpath,
                          E.SCHEMA_EXTENDS_NOT_FOUND)
            elif isinstance(target, dict) and "$extends" in target:
                self._extends(target["$extends"], rpath)
            self._extends_stack.discard(ref)

    # -- composition ------------------------------------------------------------
    def _composition(self, node: dict, path: str) -> None:
        if "JSONStructureConditionalComposition" not in self.enabled:
            for k in COMPOSITION:
                if k in node:
                    self._err(f"'{k}' requires JSONStructureConditionalComposition.",
                              f"{path}/{k}", E.SCHEMA_EXTENSION_KEYWORD_NOT_ENABLED)
            return
        for k in ("allOf", "anyOf", "oneOf"):
            if k in node:
                v = node[k]
                if not isinstance(v, list):
                    self._err(f"'{k}' must be an array.", f"{path}/{k}",
                              E.SCHEMA_COMPOSITION_NOT_ARRAY)
                elif not v:
                    self._err(f"'{k}' cannot be empty.", f"{path}/{k}",
                              E.SCHEMA_COMPOSITION_EMPTY)
                else:
                    for i, sub in enumerate(v):
                        if isinstance(sub, dict):
                            self._schema(sub, f"{path}/{k}[{i}]")
                        else:
                            self._err(f"'{k}[{i}]' must be a schema.",
                                      f"{path}/{k}[{i}]", E.SCHEMA_INVALID_TYPE)
        for k in ("not", "if", "then", "else"):
            if k in node:
                if isinstance(node[k], dict):
                    self._schema(node[k], f"{path}/{k}")
                else:
                    self._err(f"'{k}' must be a schema.", f"{path}/{k}",
                              E.SCHEMA_INVALID_TYPE)

    # -- extension (validation addin) keywords -----------------------------------
    def _maybe_warn(self, kw: str, path: str) -> None:
        if not self.warn_unused or "JSONStructureValidation" in self.enabled:
            return
        if kw not in ALL_VALIDATION_KW:
            return
        self._warn(
            f"Validation extension keyword '{kw}' used without "
            "\"$uses\": [\"JSONStructureValidation\"]; it will be ignored.",
            f"{path}/{kw}", E.SCHEMA_EXTENSION_KEYWORD_NOT_ENABLED)

    def _extension_keywords(self, node: dict, path: str) -> None:
        t = node.get("type")
        if not isinstance(t, str):
            if "default" in node:
                self._maybe_warn("default", path)
            return
        # constraint/type compatibility matrix
        if t != "string":
            for k in ("minLength", "maxLength", "pattern"):
                if k in node:
                    self._err(f"'{k}' only valid for string type, not '{t}'.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
        if t not in NUMERIC_TYPES:
            for k in NUMERIC_KW:
                if k in node:
                    self._err(f"'{k}' only valid for numeric types, not '{t}'.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
        if t not in ("array", "set", "tuple"):
            for k in ARRAY_KW:
                if k in node:
                    self._err(f"'{k}' only valid for array/set/tuple, not '{t}'.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)

        if t in NUMERIC_TYPES:
            self._numeric_kw(node, path, t)
        elif t == "string":
            self._string_kw(node, path)
        elif t in ("array", "set"):
            # reference parity: constraint-VALUE validation dispatches for
            # array/set only — tuple carries the keywords per the matrix
            # above but the reference never value-checks them either
            # (schema_validator.py:735 dispatches _check_array_validation
            # for ["array", "set"] only)
            self._array_kw(node, path, t)
        elif t in ("object", "map"):
            self._objectish_kw(node, path, t)
        if "default" in node:
            self._maybe_warn("default", path)

    def _numeric_kw(self, node: dict, path: str, t: str) -> None:
        expects_string = t in STRING_BACKED
        for k in NUMERIC_KW:
            if k not in node:
                continue
            self._maybe_warn(k, path)
            v = node[k]
            if expects_string:
                if not isinstance(v, str):
                    self._err(f"'{k}' for '{t}' must be a string.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_VALUE_INVALID)
            elif not isinstance(v, (int, float)) or isinstance(v, bool):
                if not (k in ("exclusiveMinimum", "exclusiveMaximum")
                        and isinstance(v, bool)):
                    self._err(f"'{k}' must be a number.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_VALUE_INVALID)
            elif k == "multipleOf" and v <= 0:
                self._err("'multipleOf' must be positive.", f"{path}/{k}",
                          E.SCHEMA_CONSTRAINT_VALUE_INVALID)
        mn, mx = node.get("minimum"), node.get("maximum")
        if isinstance(mn, (int, float)) and isinstance(mx, (int, float)) and mn > mx:
            self._err("'minimum' cannot exceed 'maximum'.", path,
                      E.SCHEMA_CONSTRAINT_RANGE_INVALID)

    def _string_kw(self, node: dict, path: str) -> None:
        for k in ("minLength", "maxLength"):
            if k in node:
                self._maybe_warn(k, path)
                v = node[k]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    self._err(f"'{k}' must be a non-negative integer.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_VALUE_INVALID)
        mn, mx = node.get("minLength"), node.get("maxLength")
        if isinstance(mn, int) and isinstance(mx, int) and mn > mx:
            self._err("'minLength' cannot exceed 'maxLength'.", path,
                      E.SCHEMA_CONSTRAINT_RANGE_INVALID)
        if "pattern" in node:
            self._maybe_warn("pattern", path)
            v = node["pattern"]
            if not isinstance(v, str):
                self._err("'pattern' must be a string.", f"{path}/pattern",
                          E.SCHEMA_CONSTRAINT_VALUE_INVALID)
            else:
                try:
                    re.compile(v)
                except re.error as ex:
                    self._err(f"'pattern' is not a valid regex: {ex}",
                              f"{path}/pattern", E.SCHEMA_PATTERN_INVALID)
        if "format" in node:
            self._maybe_warn("format", path)
            v = node["format"]
            if not isinstance(v, str):
                self._err("'format' must be a string.", f"{path}/format",
                          E.SCHEMA_CONSTRAINT_VALUE_INVALID)
            elif v not in VALID_FORMATS:
                self._err(f"Unknown format '{v}'.", f"{path}/format",
                          E.SCHEMA_FORMAT_UNKNOWN)
        for k in ("contentEncoding", "contentMediaType"):
            if k in node:
                self._maybe_warn(k, path)
                if not isinstance(node[k], str):
                    self._err(f"'{k}' must be a string.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_VALUE_INVALID)

    def _array_kw(self, node: dict, path: str, t: str) -> None:
        for k in ("minItems", "maxItems"):
            if k in node:
                self._maybe_warn(k, path)
                v = node[k]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    self._err(f"'{k}' must be a non-negative integer.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_VALUE_INVALID)
        mn, mx = node.get("minItems"), node.get("maxItems")
        if isinstance(mn, int) and isinstance(mx, int) and mn > mx:
            self._err("'minItems' cannot exceed 'maxItems'.", path,
                      E.SCHEMA_CONSTRAINT_RANGE_INVALID)
        if "uniqueItems" in node:
            self._maybe_warn("uniqueItems", path)
            v = node["uniqueItems"]
            if not isinstance(v, bool):
                self._err("'uniqueItems' must be boolean.", f"{path}/uniqueItems",
                          E.SCHEMA_CONSTRAINT_VALUE_INVALID)
            elif t == "set" and v is False:
                self._err("'uniqueItems' cannot be false for sets.",
                          f"{path}/uniqueItems", E.SCHEMA_CONSTRAINT_VALUE_INVALID)
        if "contains" in node:
            self._maybe_warn("contains", path)
            if isinstance(node["contains"], dict):
                self._schema(node["contains"], f"{path}/contains")
            else:
                self._err("'contains' must be a schema object.", f"{path}/contains",
                          E.SCHEMA_INVALID_TYPE)
        for k in ("minContains", "maxContains"):
            if k in node:
                self._maybe_warn(k, path)
                v = node[k]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    self._err(f"'{k}' must be a non-negative integer.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_VALUE_INVALID)
                if "contains" not in node:
                    self._err(f"'{k}' requires 'contains'.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_VALUE_INVALID)

    def _objectish_kw(self, node: dict, path: str, t: str) -> None:
        for k in ("minProperties", "maxProperties", "minEntries", "maxEntries"):
            if k in node:
                self._maybe_warn(k, path)
                if t == "map" and k.endswith("Properties"):
                    self._err(f"Use '{k.replace('Properties', 'Entries')}' for map.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                elif t == "object" and k.endswith("Entries"):
                    self._err(f"Use '{k.replace('Entries', 'Properties')}' for object.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                v = node[k]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    self._err(f"'{k}' must be a non-negative integer.",
                              f"{path}/{k}", E.SCHEMA_CONSTRAINT_VALUE_INVALID)
        if "dependentRequired" in node:
            self._maybe_warn("dependentRequired", path)
            if t != "object":
                self._err("'dependentRequired' only applies to objects.",
                          f"{path}/dependentRequired", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
            elif not isinstance(node["dependentRequired"], dict):
                self._err("'dependentRequired' must be an object.",
                          f"{path}/dependentRequired", E.SCHEMA_KEYWORD_INVALID_TYPE)
            else:
                for prop, deps in node["dependentRequired"].items():
                    if not isinstance(deps, list):
                        self._err(f"'dependentRequired/{prop}' must be an array.",
                                  f"{path}/dependentRequired/{prop}",
                                  E.SCHEMA_KEYWORD_INVALID_TYPE)
                    else:
                        for i, d in enumerate(deps):
                            if not isinstance(d, str):
                                self._err(
                                    f"'dependentRequired/{prop}[{i}]' must be a string.",
                                    f"{path}/dependentRequired/{prop}[{i}]",
                                    E.SCHEMA_KEYWORD_INVALID_TYPE)
        for k in ("patternProperties", "patternKeys"):
            if k in node:
                self._maybe_warn(k, path)
                if t == "map" and k == "patternProperties":
                    self._err("Use 'patternKeys' for map.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                elif t == "object" and k == "patternKeys":
                    self._err("Use 'patternProperties' for object.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                v = node[k]
                if not isinstance(v, dict):
                    self._err(f"'{k}' must be an object.", f"{path}/{k}",
                              E.SCHEMA_KEYWORD_INVALID_TYPE)
                else:
                    for pat, sub in v.items():
                        try:
                            re.compile(pat)
                        except re.error as ex:
                            self._err(f"'{k}/{pat}' invalid regex: {ex}",
                                      f"{path}/{k}/{pat}", E.SCHEMA_PATTERN_INVALID)
                        if isinstance(sub, dict):
                            self._schema(sub, f"{path}/{k}/{pat}")
                        else:
                            self._err(f"'{k}/{pat}' must be a schema.",
                                      f"{path}/{k}/{pat}", E.SCHEMA_INVALID_TYPE)
        for k in ("propertyNames", "keyNames"):
            if k in node:
                self._maybe_warn(k, path)
                if t == "map" and k == "propertyNames":
                    self._err("Use 'keyNames' for map.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                elif t == "object" and k == "keyNames":
                    self._err("Use 'propertyNames' for object.", f"{path}/{k}",
                              E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                v = node[k]
                if isinstance(v, dict):
                    if "type" in v and v["type"] != "string":
                        self._err(f"'{k}' schema must have type 'string'.",
                                  f"{path}/{k}", E.SCHEMA_CONSTRAINT_TYPE_MISMATCH)
                    self._schema(v, f"{path}/{k}")
                else:
                    self._err(f"'{k}' must be a schema object.", f"{path}/{k}",
                              E.SCHEMA_INVALID_TYPE)
        if "has" in node:
            self._maybe_warn("has", path)
            if isinstance(node["has"], dict):
                self._schema(node["has"], f"{path}/has")
            else:
                self._err("'has' must be a schema object.", f"{path}/has",
                          E.SCHEMA_INVALID_TYPE)


def check_schema(doc: Any, extended: bool = False, **kw) -> list[Issue]:
    """Validate a schema document; returns the error list (warnings excluded)."""
    return SchemaChecker(extended=extended, **kw).validate(doc)
