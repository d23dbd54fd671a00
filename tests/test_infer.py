"""Schema inference: the proposed schema must accept the data it came from."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdk_spark.compiler.core import CompiledSchema
from sdk_spark.schema.infer import infer_schema
from sdk_spark.schema.validator import SchemaChecker


def fixture_df(spark):
    rows = [(i, float(10 + i % 50) / 2, ["O", "F", "P"][i % 3],
             f"name-{i:04d}", None if i % 7 == 0 else i * 3)
            for i in range(200)]
    return spark.createDataFrame(
        rows, "id long, qty double, status string, label string, opt long")


def test_inferred_schema_is_wellformed(spark):
    doc = infer_schema(fixture_df(spark))
    assert SchemaChecker(extended=True).validate(doc) == []


def test_inferred_schema_accepts_its_own_data(spark):
    df = fixture_df(spark)
    doc = infer_schema(df)
    validated = CompiledSchema(doc, extended=True).validate(df)
    assert validated.where(~F.col("valid")).count() == 0


def test_inferred_constraints_shape(spark):
    doc = infer_schema(fixture_df(spark))
    p = doc["properties"]
    assert p["status"]["enum"] == ["F", "O", "P"]        # low-cardinality
    assert "enum" not in p["label"]                      # high-cardinality
    assert p["label"]["minLength"] <= 9 <= p["label"]["maxLength"]
    assert isinstance(p["id"]["minimum"], str)           # int64: digit string
    assert p["qty"]["minimum"] < 5.0 and p["qty"]["maximum"] > 29.5
    assert set(doc["required"]) == {"id", "qty", "status", "label"}
    assert "opt" not in doc["required"]                  # has NULLs


def test_inferred_schema_catches_out_of_band_rows(spark):
    df = fixture_df(spark)
    doc = infer_schema(df)
    bad = spark.createDataFrame(
        [(9999, 1e9, "X", "name-bad", 1)],
        "id long, qty double, status string, label string, opt long")
    validated = CompiledSchema(doc, extended=True).validate(bad)
    row = validated.first()
    codes = {v["constraint_id"] for v in row["violations"] if v is not None}
    assert "INSTANCE_NUMBER_MAXIMUM" in codes            # qty blown
    assert "INSTANCE_ENUM_MISMATCH" in codes             # status X


def test_infer_struct_and_array_columns(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1.0, 2.0])],
        "id long, s struct<a:long,b:string>, arr array<double>")
    doc = infer_schema(df)
    assert doc["properties"]["s"]["type"] == "object"
    assert doc["properties"]["s"]["properties"]["a"]["type"] == "int64"
    assert doc["properties"]["arr"] == {"type": "array",
                                        "items": {"type": "double"}}


def test_infer_respects_cols_filter(spark):
    doc = infer_schema(fixture_df(spark), cols=["id", "qty"])
    assert set(doc["properties"]) == {"id", "qty"}
