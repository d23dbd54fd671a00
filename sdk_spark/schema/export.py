"""Schema export: derive JSON Structure schemas from Spark types / dataclasses.

The reference exports schemas from Python dataclasses
(reference: python/src/json_structure/schema_exporter.py:184-229 TYPE_MAP +
export()); the Spark-native equivalent also derives a schema from an
existing table's ``StructType`` — the common onboarding path for validating
tables that already exist in a lakehouse.
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import typing
import uuid
from typing import Any

from pyspark.sql import types as T

META_EXTENDED = "https://json-structure.org/meta/extended/v0/#"

_SPARK_TO_JS: dict[type, str] = {
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.ByteType: "int8",
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "binary",
    T.DateType: "date",
    T.TimestampType: "datetime",
    T.TimestampNTZType: "datetime",
}

_PY_TO_JS: dict[Any, str] = {
    str: "string",
    bool: "boolean",
    int: "int32",
    float: "double",
    bytes: "binary",
    decimal.Decimal: "decimal",
    datetime.date: "date",
    datetime.datetime: "datetime",
    datetime.time: "time",
    datetime.timedelta: "duration",
    uuid.UUID: "uuid",
}


@dataclasses.dataclass
class ExportContext:
    """Passed to a ``transform_schema`` callback for every generated node
    (reference parity: ``SchemaExporterContext`` + ``_apply_transform``,
    schema_exporter.py:38,511-527).  ``type_`` is the source Python type or
    Spark ``DataType``; ``field`` the ``dataclasses.Field`` / ``StructField``
    that produced the node (None at the root / for nested element types)."""

    path: str
    type_: Any = None
    field: Any = None


#: signature of the user extension point: (context, generated_node) -> node
TransformFn = typing.Callable[[ExportContext, dict], dict]


def _xform(transform: TransformFn | None, node: dict, path: str,
           type_: Any = None, field: Any = None) -> dict:
    if transform is None:
        return node
    return transform(ExportContext(path=path, type_=type_, field=field), node)


def _node_from_spark(dt: T.DataType, transform: TransformFn | None = None,
                     path: str = "#") -> dict:
    if isinstance(dt, T.DecimalType):
        node = {"type": "decimal", "precision": dt.precision, "scale": dt.scale}
    elif isinstance(dt, T.ArrayType):
        node = {"type": "array",
                "items": _node_from_spark(dt.elementType, transform,
                                          path + "/items")}
    elif isinstance(dt, T.MapType):
        node = {"type": "map",
                "values": _node_from_spark(dt.valueType, transform,
                                           path + "/values")}
    elif isinstance(dt, T.StructType):
        node = {
            "type": "object",
            "properties": {
                f.name: _xform(transform,
                               _node_from_spark(f.dataType, transform,
                                                f"{path}/properties/{f.name}"),
                               f"{path}/properties/{f.name}",
                               type_=f.dataType, field=f)
                for f in dt.fields},
        }
    else:
        js = _SPARK_TO_JS.get(type(dt))
        node = {"type": js} if js else {"type": "any"}
    return node


def schema_from_struct_type(st: T.StructType, name: str = "ExportedRecord",
                            schema_id: str = "https://sdk-spark.local/exported",
                            required_non_nullable: bool = True,
                            transform_schema: TransformFn | None = None) -> dict:
    """Spark StructType → JSON Structure schema document.

    ``transform_schema`` is the user extension point (reference:
    schema_exporter.py:511-527): called with (ExportContext, node) for every
    generated node, returning the — possibly rewritten — node."""
    doc = {
        "$schema": META_EXTENDED,
        "$id": schema_id,
        "name": name,
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {
            f.name: _xform(transform_schema,
                           _node_from_spark(f.dataType, transform_schema,
                                            f"#/properties/{f.name}"),
                           f"#/properties/{f.name}",
                           type_=f.dataType, field=f)
            for f in st.fields},
    }
    if required_non_nullable:
        req = [f.name for f in st.fields if not f.nullable]
        if req:
            doc["required"] = req
    return _xform(transform_schema, doc, "#", type_=st)


_UNION_ORIGINS: tuple = (typing.Union,)
try:  # PEP 604 `int | str` unions: get_origin returns types.UnionType
    import types as _pytypes

    _UNION_ORIGINS = (typing.Union, _pytypes.UnionType)
except AttributeError:  # pragma: no cover — pre-3.10
    pass


def _is_union(origin: Any) -> bool:
    return origin in _UNION_ORIGINS


def _choice_name(a: Any, node: dict, i: int) -> str:
    if dataclasses.is_dataclass(a):
        return a.__name__
    t = node.get("type")
    return t if isinstance(t, str) else f"choice{i}"


def _node_from_pytype(tp: Any, transform: TransformFn | None = None,
                      path: str = "#") -> dict:
    origin = typing.get_origin(tp)
    if _is_union(origin):
        args = [a for a in typing.get_args(tp)]
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) == 1:
            # Optional[X] → X, nullable
            return _node_from_pytype(non_none[0], transform, path)
        members = [_node_from_pytype(a, transform, f"{path}/choices")
                   for a in non_none]
        if all(isinstance(n.get("type"), str) and len(n) == 1
               for n in members):
            # scalar-only union → compact type list (the compiler's
            # first-match dispatch form)
            return {"type": [n["type"] for n in members]}
        # any compound member (dataclass/list/dict): a bare name in a type
        # list would discard its structure AND be rejected by the schema
        # checker ("inline compound not permitted in union; use $ref") —
        # export as a choice with full subschemas, the reference exporter's
        # shape (schema_exporter.py:317-329)
        return {"type": "choice",
                "choices": {_choice_name(a, n, i): n
                            for i, (a, n) in enumerate(zip(non_none,
                                                           members))}}
    if origin in (list, set, frozenset):
        (item,) = typing.get_args(tp) or (Any,)
        t = "set" if origin in (set, frozenset) else "array"
        return {"type": t,
                "items": _node_from_pytype(item, transform, path + "/items")}
    if origin is dict:
        args = typing.get_args(tp)
        val = args[1] if len(args) == 2 else Any
        return {"type": "map",
                "values": _node_from_pytype(val, transform, path + "/values")}
    if dataclasses.is_dataclass(tp):
        return _object_from_dataclass(tp, transform, path)
    js = _PY_TO_JS.get(tp)
    return {"type": js} if js else {"type": "any"}


def _object_from_dataclass(cls: type, transform: TransformFn | None = None,
                           path: str = "#") -> dict:
    props, required = {}, []
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        tp = hints.get(f.name, Any)
        fpath = f"{path}/properties/{f.name}"
        props[f.name] = _xform(transform,
                               _node_from_pytype(tp, transform, fpath),
                               fpath, type_=tp, field=f)
        is_optional = (_is_union(typing.get_origin(tp))
                       and type(None) in typing.get_args(tp))
        has_default = (f.default is not dataclasses.MISSING
                       or f.default_factory is not dataclasses.MISSING)
        if not is_optional and not has_default:
            required.append(f.name)
    node = {"type": "object", "properties": props}
    if required:
        node["required"] = required
    return node


def schema_from_dataclass(cls: type,
                          schema_id: str = "https://sdk-spark.local/exported",
                          transform_schema: TransformFn | None = None
                          ) -> dict:
    """Python dataclass → JSON Structure schema (reference exporter parity,
    incl. the ``transform_schema`` per-node rewrite callback —
    schema_exporter.py:38,511-527)."""
    node = _object_from_dataclass(cls, transform_schema)
    doc = {
        "$schema": META_EXTENDED,
        "$id": schema_id,
        "name": cls.__name__,
        "$uses": ["JSONStructureValidation"],
        **node,
    }
    return _xform(transform_schema, doc, "#", type_=cls)
