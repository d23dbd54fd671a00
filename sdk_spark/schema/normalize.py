"""Compile-time schema graph operations (driver-side, pure Python).

The reference validator re-resolves ``$ref``/``$extends``/``$root`` on every
``validate_instance`` call (reference: instance_validator.py:162-169,
264-314); our engine instead performs all graph operations ONCE at compile
time, producing an *effective* schema tree that the Catalyst compiler
lowers to Column expressions.  Cycles are rejected up front (the schema
checker flags them), with a depth cap as a defensive backstop for
adversarial recursive schemas.
"""

from __future__ import annotations

from typing import Any

META_CORE = "https://json-structure.org/meta/core/v0/#"
META_VALIDATION = "https://json-structure.org/meta/validation/v0/#"
META_EXTENDED = "https://json-structure.org/meta/extended/v0/#"
BUILTIN_ADDINS = (
    "JSONStructureValidation",
    "JSONStructureConditionalComposition",
    "JSONStructureAlternateNames",
    "JSONStructureUnits",
)


class SchemaCompileError(ValueError):
    """Raised when a schema cannot be compiled (unresolvable ref, cycle...)."""


def deref(root: dict, pointer: str) -> Any:
    """JSON-pointer lookup with ~0/~1 unescaping (same-document refs only)."""
    if not isinstance(pointer, str) or not pointer.startswith("#"):
        return None
    node: Any = root
    for seg in pointer.lstrip("#").split("/"):
        if seg == "":
            continue
        seg = seg.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict) and seg in node:
            node = node[seg]
        else:
            return None
    return node


def detect_extensions(root: dict, extended: bool = False) -> set[str]:
    """Which addins are active for this document.

    Mirrors reference enablement (instance_validator.py:91-103, 130-144):
    validation/extended metaschema URIs and the ``$uses`` list switch the
    conditional-composition and validation keyword families on.
    """
    exts: set[str] = set()
    uri = root.get("$schema", "") if isinstance(root, dict) else ""
    if "extended" in uri or "validation" in uri:
        exts.update(("JSONStructureConditionalComposition", "JSONStructureValidation"))
    uses = root.get("$uses", []) if isinstance(root, dict) else []
    if isinstance(uses, list):
        exts.update(u for u in uses if isinstance(u, str))
    if extended:
        exts.update(("JSONStructureConditionalComposition", "JSONStructureValidation"))
    if uri == META_EXTENDED and isinstance(root, dict) and "$uses" in root:
        exts.update(BUILTIN_ADDINS)
    return exts


def effective(root: dict, node: Any, depth: int = 0, max_depth: int = 64,
              as_base: bool = False) -> dict:
    """Resolve one schema node to its effective form.

    Handles ``$ref``, ``type: {$ref}`` merge, ``$extends`` flattening, and
    ``$root`` redirection.  Does NOT recurse into child schemas (the
    compiler resolves children lazily so recursive schemas stay finite).

    ``as_base=True`` marks resolution of an ``$extends`` BASE: abstract
    bases are the whole point of ``abstract`` and must resolve without
    error — the reference never inspects the base's flag during the merge
    (instance_validator.py:280-316), and strips the derived node's own
    flag afterwards, so only a schema used DIRECTLY for validation with
    ``abstract: true`` and no ``$extends`` is rejected.
    """
    if depth > max_depth:
        raise SchemaCompileError("schema graph too deep (possible $ref cycle)")
    if not isinstance(node, dict):
        raise SchemaCompileError(f"schema node must be an object, got {type(node).__name__}")

    if node is root and "$root" in node and "type" not in node:
        target = deref(root, node["$root"])
        if target is None:
            raise SchemaCompileError(f"cannot resolve $root {node['$root']}")
        return effective(root, target, depth + 1, max_depth)

    if "$ref" in node:
        target = deref(root, node["$ref"])
        if target is None:
            raise SchemaCompileError(f"cannot resolve $ref {node['$ref']}")
        return effective(root, target, depth + 1, max_depth)

    stype = node.get("type")
    if isinstance(stype, dict):
        if "$ref" not in stype:
            raise SchemaCompileError("type object must carry $ref")
        target = deref(root, stype["$ref"])
        if target is None:
            raise SchemaCompileError(f"cannot resolve $ref {stype['$ref']}")
        target = effective(root, target, depth + 1, max_depth)
        merged = dict(node)
        merged["type"] = target.get("type")
        if "properties" in target:
            props = dict(target["properties"])
            props.update(merged.get("properties", {}))
            merged["properties"] = props
        for kw in ("tuple", "choices", "selector"):
            if kw in target:
                merged[kw] = target[kw]
        # reference parity: type:{$ref} copies ONLY the structural keywords
        # (type/properties/tuple/choices/selector/required/$extends) — value
        # constraints like enum/const on the target do NOT transfer
        # (reference: instance_validator.py:209-240); items/values added
        # pragmatically for container refs
        for kw in ("required", "$extends", "items", "values"):
            if kw in target and kw not in merged:
                merged[kw] = target[kw]
        node = merged
        stype = node.get("type")

    if isinstance(stype, str) and stype != "choice" and "$extends" in node:
        refs = node["$extends"]
        refs = [refs] if isinstance(refs, str) else [r for r in refs if isinstance(r, str)]
        base_props: dict = {}
        req: list[str] = []
        for r in refs:
            base = deref(root, r)
            if base is None:
                raise SchemaCompileError(f"cannot resolve $extends {r}")
            base = effective(root, base, depth + 1, max_depth, as_base=True)
            for k, v in base.get("properties", {}).items():
                base_props.setdefault(k, v)
            for x in base.get("required", []) or []:
                if x not in req:
                    req.append(x)
        own = node.get("properties", {})
        clash = [k for k in own if k in base_props]
        if clash:
            raise SchemaCompileError(
                f"properties {clash} redefine inherited properties via $extends")
        base_props.update(own)
        for x in node.get("required", []) or []:
            if x not in req:
                req.append(x)
        flat = {k: v for k, v in node.items() if k not in ("$extends", "abstract")}
        if base_props:
            flat["properties"] = base_props
        if req:
            flat["required"] = req
        node = flat

    if node.get("abstract") is True and not as_base:
        raise SchemaCompileError("abstract schema cannot validate instances")
    return node


def import_defs(root: dict, external_schemas: dict[str, dict] | None = None) -> dict:
    """Process ``$import``/``$importdefs``: merge external definitions
    (first-wins) and rewrite their internal refs to the new home.

    Mirrors reference merge semantics (instance_validator.py:1117-1187).
    External schemas are provided by ``$id`` (no network access).
    """
    import copy as _copy

    external_schemas = external_schemas or {}
    root = _copy.deepcopy(root)

    def rewrite(obj: Any, target_path: str) -> None:
        # Reference parity, bug-for-bug: the rewrite keeps only the LAST
        # pointer segment (reference _rewrite_refs,
        # instance_validator.py:1085-1090 uses ref_parts[-1]), so a ref
        # into a nested imported namespace (#/definitions/ns/Foo) dangles
        # after import in BOTH engines.  Deliberately not "fixed" here —
        # diverging would break differential parity with the reference.
        if isinstance(obj, dict):
            for k, v in obj.items():
                if k == "$ref" and isinstance(v, str) and v.startswith("#"):
                    parts = [p for p in v.lstrip("#").split("/") if p]
                    if parts:
                        obj[k] = f"{target_path}/{parts[-1]}"
                elif k == "$extends":
                    if isinstance(v, str) and v.startswith("#"):
                        parts = [p for p in v.lstrip("#").split("/") if p]
                        if parts:
                            obj[k] = f"{target_path}/{parts[-1]}"
                    elif isinstance(v, list):
                        obj[k] = [
                            f"{target_path}/{[p for p in i.lstrip('#').split('/') if p][-1]}"
                            if isinstance(i, str) and i.startswith("#") else i
                            for i in v
                        ]
                else:
                    rewrite(v, target_path)
        elif isinstance(obj, list):
            for item in obj:
                rewrite(item, target_path)

    def walk(obj: Any, path: str) -> None:
        if isinstance(obj, dict):
            for key in list(obj):
                if key in ("$import", "$importdefs"):
                    uri = obj[key]
                    ext = external_schemas.get(uri)
                    if ext is None:
                        raise SchemaCompileError(f"unresolved import {uri}")
                    if key == "$import":
                        defs = {}
                        if "type" in ext and "name" in ext:
                            defs[ext["name"]] = ext
                        defs.update(ext.get("definitions", {}) or {})
                    else:
                        defs = dict(ext.get("definitions", {}) or {})
                    if path == "#":
                        target_path = "#/definitions"
                        merge_target = obj.setdefault("definitions", {})
                    else:
                        target_path = path
                        merge_target = obj
                    for k, v in defs.items():
                        if isinstance(v, dict):
                            v = _copy.deepcopy(v)
                            rewrite(v, target_path)
                        merge_target.setdefault(k, v)
                    del obj[key]
            for k, v in obj.items():
                if k != "properties":
                    walk(v, f"{path}/{k}")
        elif isinstance(obj, list):
            for i, item in enumerate(obj):
                walk(item, f"{path}[{i}]")

    walk(root, "#")
    return root
