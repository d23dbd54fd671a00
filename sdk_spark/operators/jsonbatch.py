"""Arrow-batched validation of schema-flexible JSON (the designated slow path).

Typed tables go through the Catalyst compiler (``sdk_spark.compiler``); this
operator covers what Catalyst cannot express statically: arbitrary nesting,
runtime JSON type dispatch, recursive schemas, and Python-dialect regexes.
The row kernel (``sdk_spark.rowcheck``) runs inside ``mapInPandas`` over
Arrow record batches — one schema compile per task, zero driver round-trips,
never row-at-a-time UDF calls at the API layer.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def validate_json_column(df: DataFrame, json_col: str, schema: dict,
                         key_cols: list[str] | None = None,
                         extended: bool = True) -> DataFrame:
    """Violation rows for every JSON document in ``df[json_col]``.

    Returns (key columns..., constraint_id, path, value); parse failures
    surface as INSTANCE_TYPE_MISMATCH at path '#'.
    """
    key_cols = key_cols or []
    # field order must follow key_cols (row tuples are built in that order;
    # schema built in DataFrame order would mislabel reordered keys)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [by_name[k] for k in key_cols]
        + [T.StructField("constraint_id", T.StringType(), True),
           T.StructField("path", T.StringType(), True),
           T.StructField("value", T.StringType(), True)])
    cols = df.select(*key_cols, json_col)
    names = key_cols + [json_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..rowcheck import RowChecker

        checker = RowChecker(schema, extended=extended)
        for pdf in batches:
            rows = []
            for tup in pdf[names].itertuples(index=False):
                *keys, text = tup
                if text is None:
                    # same semantic as json_verdicts: a NULL document is a
                    # type mismatch, not silently valid
                    rows.append((*keys, "INSTANCE_TYPE_MISMATCH", "#", None))
                    continue
                try:
                    value = json.loads(text)
                except (ValueError, TypeError):
                    rows.append((*keys, "INSTANCE_TYPE_MISMATCH", "#",
                                 str(text)[:128]))
                    continue
                for f in checker.check(value):
                    rows.append((*keys, f.code, f.path, f.value))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return cols.mapInPandas(kernel, out_schema)


def json_verdicts(df: DataFrame, json_col: str, schema: dict,
                  extended: bool = True) -> DataFrame:
    """Per-document validity flags (keeps all input columns + ``valid``)."""
    out_schema = T.StructType(list(df.schema.fields)
                              + [T.StructField("valid", T.BooleanType(), True)])
    names = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..rowcheck import RowChecker

        checker = RowChecker(schema, extended=extended)
        for pdf in batches:
            flags = []
            for text in pdf[json_col]:
                if text is None:
                    flags.append(False)
                    continue
                try:
                    flags.append(checker.is_valid(json.loads(text)))
                except (ValueError, TypeError):
                    flags.append(False)
            pdf = pdf.copy()
            pdf["valid"] = flags
            yield pdf

    return df.mapInPandas(kernel, out_schema)
