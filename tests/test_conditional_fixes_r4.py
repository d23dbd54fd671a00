"""if/then/else kernel semantics (r4 fixes).

Two defects fixed together, both pinned here against the reference
semantics (instance_validator.py:813-827):

1. branch DIRECTION was inverted (if-matched ran `else`);
2. then/else branches did not inherit the root's $uses, so validation
   keywords inside them never fired.
"""

from __future__ import annotations

from sdk_spark.rowcheck import RowChecker

META = "https://json-structure.org/meta/extended/v0/#"

SCHEMA = {
    "$schema": META, "name": "Cond",
    "$uses": ["JSONStructureConditionalComposition",
              "JSONStructureValidation"],
    "type": "object",
    "properties": {"k": {"type": "int32"}}, "required": ["k"],
    "if": {"type": "object",
           "properties": {"k": {"type": "int32", "minimum": 50}}},
    "then": {"type": "object",
             "properties": {"k": {"type": "int32", "maximum": 75}}},
    "else": {"type": "object",
             "properties": {"k": {"type": "int32", "multipleOf": 2}}},
}


def codes(k):
    rc = RowChecker(SCHEMA, extended=True)
    return [(f.code, f.path) for f in rc.check({"k": k})]


def test_if_matched_runs_then():
    assert codes(80) == [("INSTANCE_NUMBER_MAXIMUM", "#/then/k")]
    assert codes(60) == []          # if matched, then satisfied


def test_if_failed_runs_else():
    assert codes(11) == [("INSTANCE_NUMBER_MULTIPLE_OF", "#/else/k")]
    assert codes(20) == []          # if failed, else satisfied


def test_then_else_inherit_root_uses():
    """The validation addins above live ONLY in the branch subschemas
    (no per-branch $uses) — they must still fire via root inheritance."""
    assert "$uses" not in SCHEMA["then"] and "$uses" not in SCHEMA["else"]
    assert codes(80) and codes(11)


def test_if_without_else_is_silent_on_fail():
    s = {k: v for k, v in SCHEMA.items() if k != "else"}
    rc = RowChecker(s, extended=True)
    assert rc.check({"k": 11}) == []
    assert [f.code for f in rc.check({"k": 80})] \
        == ["INSTANCE_NUMBER_MAXIMUM"]


def test_catalyst_kernel_parity_on_conditionals(spark):
    """The Catalyst lowering (F.when(cond, then_ok).otherwise(else_ok))
    and the fixed kernel must agree row-by-row on if/then/else with
    validation addins inside the branches."""
    from sdk_spark.compiler.core import CompiledSchema

    plan = CompiledSchema(SCHEMA, extended=True)
    ks = list(range(0, 120, 7)) + [49, 50, 51, 75, 76]
    df = spark.createDataFrame([(k,) for k in ks], "k int")
    got = {r["k"]: r["valid"] for r in plan.validate(df).collect()}
    for k in ks:
        kernel_valid = codes(k) == []
        assert got[k] == kernel_valid, (
            f"k={k}: catalyst={got[k]} kernel={kernel_valid}")


def test_catalyst_kernel_parity_oneof_bands(spark):
    """Same parity check for the overlapping-band oneOf shape used by
    the json_oneof_check driver query."""
    from sdk_spark.compiler.core import CompiledSchema

    s = {"$schema": META, "name": "One",
         "$uses": ["JSONStructureConditionalComposition",
                   "JSONStructureValidation"],
         "type": "object",
         "properties": {"k": {"type": "int32"}}, "required": ["k"],
         "oneOf": [
             {"type": "object",
              "properties": {"k": {"type": "int32", "maximum": 30}}},
             {"type": "object",
              "properties": {"k": {"type": "int32", "minimum": 25,
                                   "maximum": 60}}}]}
    from sdk_spark.rowcheck import RowChecker

    rc = RowChecker(s, extended=True)
    plan = CompiledSchema(s, extended=True)
    ks = [0, 24, 25, 30, 31, 45, 60, 61, 99]
    df = spark.createDataFrame([(k,) for k in ks], "k int")
    got = {r["k"]: r["valid"] for r in plan.validate(df).collect()}
    for k in ks:
        assert got[k] == (rc.check({"k": k}) == []), k
