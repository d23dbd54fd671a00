"""Typed ingestion of JSON values into Spark rows.

Converts parsed JSON instances into rows matching a compiled schema's
expected ``StructType`` (``CompiledSchema.struct_type()``).  Used by the
conformance harness and by the semi-structured → typed promotion path.
Production tables (parquet/Iceberg) are already typed and skip this.
"""

from __future__ import annotations

import base64
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class IngestError(ValueError):
    """Value cannot be represented in the target Spark type."""


def coerce(value: Any, dt: T.DataType) -> Any:
    if value is None:
        return None
    if isinstance(dt, T.StringType):
        if not isinstance(value, str):
            # 'any'-typed nodes land in string columns: carry canonical JSON
            import json
            return json.dumps(value, sort_keys=True)
        return value
    if isinstance(dt, T.BooleanType):
        if not isinstance(value, bool):
            raise IngestError("expected bool")
        return value
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        if isinstance(value, bool) or not isinstance(value, int):
            raise IngestError("expected int")
        return value
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise IngestError("expected number")
        return float(value)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal, InvalidOperation
        try:
            return Decimal(str(value))
        except InvalidOperation as exc:
            # InvalidOperation is an ArithmeticError, NOT a ValueError —
            # without this it escapes every IngestError handler
            raise IngestError(f"expected decimal, got {value!r}") from exc
    if isinstance(dt, T.BinaryType):
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        if isinstance(value, str):
            try:
                # validate=True: without it, non-alphabet characters are
                # silently DISCARDED and garbage ingests as empty bytes —
                # fail-open in a validation engine
                return base64.b64decode(value, validate=True)
            except Exception as exc:
                raise IngestError(f"invalid base64: {exc}") from exc
        raise IngestError("expected binary")
    if isinstance(dt, T.ArrayType):
        if not isinstance(value, list):
            raise IngestError("expected list")
        return [coerce(x, dt.elementType) for x in value]
    if isinstance(dt, T.MapType):
        if not isinstance(value, dict):
            raise IngestError("expected dict")
        return {k: coerce(v, dt.valueType) for k, v in value.items()}
    if isinstance(dt, T.StructType):
        if isinstance(value, dict):
            return tuple(coerce(value.get(f.name), f.dataType) for f in dt.fields)
        if isinstance(value, list):  # tuple type: positional
            if len(value) != len(dt.fields):
                raise IngestError("tuple arity mismatch")
            return tuple(coerce(v, f.dataType) for v, f in zip(value, dt.fields))
        raise IngestError("expected object/tuple")
    return value


def instances_df(spark: SparkSession, struct_type: T.StructType,
                 instances: list[Any], scalar_root: bool,
                 case_ids: list[str] | None = None) -> DataFrame:
    """One row per instance; objects map to columns, scalars to 'value'."""
    st = T.StructType(list(struct_type.fields))
    if case_ids is not None:
        st = T.StructType([T.StructField("case_id", T.StringType(), False)]
                          + list(struct_type.fields))
    rows = []
    for i, inst in enumerate(instances):
        if scalar_root:
            row = (coerce(inst, struct_type.fields[0].dataType),)
        else:
            row = coerce(inst, struct_type)
            if row is None:
                # a null root against an object schema becomes an all-NULL
                # row the validator can flag (required-missing), instead of
                # crashing the harness on tuple(None)
                row = tuple(None for _ in struct_type.fields)
        if case_ids is not None:
            row = (case_ids[i],) + tuple(row)
        rows.append(row)
    return spark.createDataFrame(rows, st)
