"""Schema inference: bootstrap a JSON Structure constraint schema from data.

``schema_from_struct_type`` (export.py) maps Spark TYPES to a schema;
this module goes further and proposes CONSTRAINTS from observed values —
the authoring-loop bootstrap for a validation pipeline: profile a healthy
sample of the table once, review/tighten the proposal, then compile it
with ``CompiledSchema`` as the production gate.

Everything derives from one profile pass (``table_checks.column_profile``
shape: count / nulls / min / max / HLL distinct) plus a bounded second
pass that collects exact value sets ONLY for columns the HLL estimate
marks as enum candidates, so inference on a 10^12-row table is two scans
of the profiled columns — or of a seeded sample via ``sample_fraction``.

Proposal rules (each one documented in the emitted schema's
``description`` so a reviewer can see WHY a constraint exists):

* ``required``      — null-rate == 0 in the profile
* ``minimum/maximum`` — observed numeric range, widened by ``margin``
  (relative), so healthy drift does not instantly violate
* ``enum``          — string column whose exact distinct count is at most
  ``enum_limit`` (HLL prefilter, exact confirm)
* ``minLength/maxLength`` — observed string length range (margin-widened)

Inference is a HEURISTIC — the output is a draft for human review, not
ground truth; rules err on the permissive side (margins, no pattern
synthesis) so a generated schema never rejects the data it was inferred
from.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META = "https://json-structure.org/meta/extended/v0/#"

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

_SPARK_TO_STRUCT = {
    T.ByteType: "int8", T.ShortType: "int16", T.IntegerType: "int32",
    T.LongType: "int64", T.FloatType: "float", T.DoubleType: "double",
    T.StringType: "string", T.BooleanType: "boolean",
    T.BinaryType: "binary", T.DateType: "date",
    T.TimestampType: "datetime", T.TimestampNTZType: "datetime",
}


def _widen(lo: float, hi: float, margin: float) -> tuple[float, float]:
    span = hi - lo
    pad = span * margin if span > 0 else (abs(hi) * margin or 1.0)
    return lo - pad, hi + pad


def _maybe_int(x: float) -> int | float:
    return int(x) if float(x).is_integer() else x


def infer_schema(df: DataFrame, name: str = "InferredRecord",
                 schema_id: str = "https://sdk-spark.local/inferred",
                 cols: list[str] | None = None,
                 margin: float = 0.1, enum_limit: int = 16,
                 sample_fraction: float | None = None,
                 seed: int = 42) -> dict:
    """Propose a JSON Structure schema (types + constraints) from data."""
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    fields = {f.name: f.dataType for f in df.schema.fields
              if cols is None or f.name in (cols or [])}
    profiled = [c for c, dt in fields.items()
                if isinstance(dt, _NUMERIC + (T.StringType,))]

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c, dt in fields.items():
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__n"))
        if isinstance(dt, _NUMERIC):
            aggs += [F.min(c).cast("double").alias(f"{c}__lo"),
                     F.max(c).cast("double").alias(f"{c}__hi")]
        elif isinstance(dt, T.StringType):
            aggs += [F.min(F.length(c)).alias(f"{c}__lo"),
                     F.max(F.length(c)).alias(f"{c}__hi"),
                     F.approx_count_distinct(c).alias(f"{c}__d")]
    raw = df.agg(*aggs).first()
    rows = raw["__rows"]
    # SQL aggregates over ZERO rows return NULL (not 0): normalize so an
    # empty DataFrame / empty sample yields a types-only schema instead of
    # a TypeError on None-vs-int comparisons
    row = {k: (0 if raw[k] is None and (k.endswith("__n") or k == "__rows"
                                        or k.endswith("__d")) else raw[k])
           for k in raw.asDict()}

    # second (tiny) pass: exact value sets ONLY for columns the HLL
    # estimate marks as enum candidates — an uncapped collect_set on a
    # high-cardinality column would materialize every distinct value
    enum_candidates = [
        c for c, dt in fields.items()
        if isinstance(dt, T.StringType) and row[f"{c}__n"] < rows
        and row[f"{c}__d"] <= enum_limit * 2]
    enum_vals: dict[str, list] = {}
    if enum_candidates:
        vrow = df.agg(*[F.collect_set(c).alias(c)
                        for c in enum_candidates]).first()
        enum_vals = {c: vrow[c] for c in enum_candidates}

    props: dict[str, dict] = {}
    required: list[str] = []
    for c, dt in fields.items():
        node: dict = {}
        stype = next((v for k, v in _SPARK_TO_STRUCT.items()
                      if isinstance(dt, k)), None)
        if isinstance(dt, T.DecimalType):
            stype = "decimal"
        elif isinstance(dt, T.ArrayType):
            inner = next((v for k, v in _SPARK_TO_STRUCT.items()
                          if isinstance(dt.elementType, k)), "any")
            node = {"type": "array", "items": {"type": inner}}
        elif isinstance(dt, T.MapType):
            node = {"type": "map",
                    "values": {"type": next(
                        (v for k, v in _SPARK_TO_STRUCT.items()
                         if isinstance(dt.valueType, k)), "any")}}
        elif isinstance(dt, T.StructType):
            # typed structs compile as CLOSED objects — emit the real
            # sub-fields (types only) so the schema accepts its own data
            node = {"type": "object", "properties": {
                sub.name: {"type": next(
                    (v for k, v in _SPARK_TO_STRUCT.items()
                     if isinstance(sub.dataType, k)), "any")}
                for sub in dt.fields}}
        if not node:
            if stype is None:
                continue                      # unmappable type: skip
            node = {"type": stype}

        nulls = row[f"{c}__n"]
        if rows > 0 and nulls == 0:
            required.append(c)

        if c in profiled and rows > nulls:
            lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
            if isinstance(dt, _NUMERIC) and lo is not None:
                wlo, whi = _widen(float(lo), float(hi), margin)
                if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType)):
                    wlo, whi = math.floor(wlo), math.ceil(whi)
                if isinstance(dt, T.LongType):
                    # int64 is a string-backed type in JSON Structure:
                    # its bounds must be digit strings
                    node["minimum"] = str(int(wlo))
                    node["maximum"] = str(int(whi))
                elif isinstance(dt, T.DecimalType):
                    # decimal is string-backed too: numeric bounds would be
                    # rejected by the engine's own check_schema
                    node["minimum"] = str(wlo)
                    node["maximum"] = str(whi)
                else:
                    node["minimum"] = _maybe_int(wlo)
                    node["maximum"] = _maybe_int(whi)
                node["description"] = (
                    f"inferred: observed [{lo}, {hi}] over {rows} rows, "
                    f"widened {margin:.0%}")
            elif isinstance(dt, T.StringType) and lo is not None:
                vals = enum_vals.get(c, [])
                if c in enum_vals and len(vals) <= enum_limit:
                    node["enum"] = sorted(v for v in vals if v is not None)
                    node["description"] = (
                        f"inferred: {len(node['enum'])} distinct values "
                        f"over {rows} rows")
                else:
                    node["minLength"] = max(0, math.floor(
                        int(lo) * (1 - margin)))
                    node["maxLength"] = math.ceil(int(hi) * (1 + margin))
                    node["description"] = (
                        f"inferred: lengths [{lo}, {hi}] over {rows} "
                        f"rows, widened {margin:.0%}")
        props[c] = node

    out = {
        "$schema": META, "$id": schema_id, "name": name,
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": props,
    }
    if required:
        out["required"] = required
    return out
