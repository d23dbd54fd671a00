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


def _node_from_spark(dt: T.DataType) -> dict:
    if isinstance(dt, T.DecimalType):
        return {"type": "decimal", "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _node_from_spark(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": _node_from_spark(dt.valueType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {f.name: _node_from_spark(f.dataType) for f in dt.fields},
        }
    js = _SPARK_TO_JS.get(type(dt))
    if js is None:
        return {"type": "any"}
    return {"type": js}


def schema_from_struct_type(st: T.StructType, name: str = "ExportedRecord",
                            schema_id: str = "https://sdk-spark.local/exported",
                            required_non_nullable: bool = True) -> dict:
    """Spark StructType → JSON Structure schema document."""
    doc = {
        "$schema": META_EXTENDED,
        "$id": schema_id,
        "name": name,
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {f.name: _node_from_spark(f.dataType) for f in st.fields},
    }
    if required_non_nullable:
        req = [f.name for f in st.fields if not f.nullable]
        if req:
            doc["required"] = req
    return doc


def _node_from_pytype(tp: Any) -> dict:
    origin = typing.get_origin(tp)
    if origin is typing.Union or str(origin) == "types.UnionType":
        args = [a for a in typing.get_args(tp)]
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) == 1:
            return _node_from_pytype(non_none[0])  # Optional[X] → X, nullable
        return {"type": [
            _node_from_pytype(a).get("type", "any") for a in non_none]}
    if origin in (list, set, frozenset):
        (item,) = typing.get_args(tp) or (Any,)
        t = "set" if origin in (set, frozenset) else "array"
        return {"type": t, "items": _node_from_pytype(item)}
    if origin is dict:
        args = typing.get_args(tp)
        val = args[1] if len(args) == 2 else Any
        return {"type": "map", "values": _node_from_pytype(val)}
    if dataclasses.is_dataclass(tp):
        return _object_from_dataclass(tp)
    js = _PY_TO_JS.get(tp)
    return {"type": js} if js else {"type": "any"}


def _object_from_dataclass(cls: type) -> dict:
    props, required = {}, []
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        tp = hints.get(f.name, Any)
        props[f.name] = _node_from_pytype(tp)
        is_optional = (typing.get_origin(tp) is typing.Union
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
                          schema_id: str = "https://sdk-spark.local/exported"
                          ) -> dict:
    """Python dataclass → JSON Structure schema (reference exporter parity)."""
    node = _object_from_dataclass(cls)
    return {
        "$schema": META_EXTENDED,
        "$id": schema_id,
        "name": cls.__name__,
        "$uses": ["JSONStructureValidation"],
        **node,
    }
