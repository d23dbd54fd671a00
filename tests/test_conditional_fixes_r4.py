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
