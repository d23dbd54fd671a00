"""Randomized differential fuzz: engine kernel vs the reference SDK.

Hypothesis generates (schema, instance) pairs inside the well-defined
region of the dialect (native-typed values only — string-backed-numeric
and union-handler divergences are pinned separately in
test_regex_and_precision.py / test_corpus_rowcheck.py) and asserts the
pure-Python kernel and the reference ``JSONStructureInstanceValidator``
reach the same VALID/INVALID verdict.  Verdict-level comparison is the
robust contract: per-error granularity legitimately differs (e.g. the
engine's MIN_CONTAINS implies CONTAINS_NONE at zero matches).
"""
from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

META = "https://json-structure.org/meta/extended/v0/#"

# property name pool (fixed: keeps shrinking fast and paths readable)
_NAMES = ["alpha", "beta", "gamma", "delta"]

_SAFE_PATTERNS = ["^ab", "cd$", "^[a-z]+$", "x.y", "^\\d+$"]


@st.composite
def _string_constraints(draw):
    c = {}
    if draw(st.booleans()):
        c["minLength"] = draw(st.integers(0, 4))
    if draw(st.booleans()):
        c["maxLength"] = draw(st.integers(4, 10))
    if draw(st.booleans()):
        c["pattern"] = draw(st.sampled_from(_SAFE_PATTERNS))
    if draw(st.booleans()):
        c["enum"] = draw(st.lists(
            st.text(alphabet="abxyz0189", min_size=0, max_size=6),
            min_size=1, max_size=4, unique=True))
    return c


@st.composite
def _numeric_constraints(draw, kind: str):
    c = {}
    lo = draw(st.integers(-50, 50))
    if draw(st.booleans()):
        key = draw(st.sampled_from(["minimum", "exclusiveMinimum"]))
        c[key] = lo
    if draw(st.booleans()):
        key = draw(st.sampled_from(["maximum", "exclusiveMaximum"]))
        c[key] = lo + draw(st.integers(0, 100))
    if kind == "int32" and draw(st.booleans()):
        c["multipleOf"] = draw(st.integers(1, 7))
    return c


@st.composite
def _property(draw):
    kind = draw(st.sampled_from(
        ["string", "int32", "int64", "double", "boolean",
         "array_string", "array_int"]))
    if kind == "string":
        node = {"type": "string", **draw(_string_constraints())}
    elif kind in ("int32", "int64"):
        node = {"type": kind, **draw(_numeric_constraints(kind))}
    elif kind == "double":
        node = {"type": "double", **draw(_numeric_constraints(kind))}
    elif kind == "boolean":
        node = {"type": "boolean"}
    else:
        item_t = "string" if kind == "array_string" else "int32"
        node = {"type": "array", "items": {"type": item_t}}
        if draw(st.booleans()):
            node["minItems"] = draw(st.integers(0, 2))
        if draw(st.booleans()):
            node["maxItems"] = draw(st.integers(2, 5))
    return node


@st.composite
def _value_for(draw, node):
    """A value biased toward the constraint boundaries — valid or not."""
    t = node["type"]
    wild = draw(st.integers(0, 9))
    if wild == 0:      # type-mismatch injection
        return draw(st.sampled_from(
            [True, "zz", 3.5, [1], {"k": 1}, -7]))
    if t == "string":
        if "enum" in node and draw(st.booleans()):
            pool = node["enum"] + ["NOT-IN-ENUM"]
            return draw(st.sampled_from(pool))
        return draw(st.text(alphabet="abxyz0189 ", min_size=0, max_size=12))
    if t in ("int32", "int64"):
        base = node.get("minimum", node.get("exclusiveMinimum", 0))
        return int(base) + draw(st.integers(-3, 120))
    if t == "double":
        base = node.get("minimum", node.get("exclusiveMinimum", 0))
        v = float(base) + draw(st.floats(-3, 120, allow_nan=False,
                                         allow_infinity=False))
        return round(v, 3)
    if t == "boolean":
        return draw(st.booleans())
    if t == "array":
        item = node["items"]["type"]
        n = draw(st.integers(0, 6))
        if item == "string":
            return [draw(st.text(alphabet="ab", max_size=3))
                    for _ in range(n)]
        return [draw(st.integers(-5, 5)) for _ in range(n)]
    raise AssertionError(t)


@st.composite
def case(draw):
    names = draw(st.lists(st.sampled_from(_NAMES), min_size=1,
                          max_size=4, unique=True))
    props = {n: draw(_property()) for n in names}
    schema = {"$schema": META, "$id": "https://fuzz.local/s", "name": "F",
              "$uses": ["JSONStructureValidation"],
              "type": "object", "properties": props}
    req = draw(st.lists(st.sampled_from(names), unique=True, max_size=len(names)))
    if req:
        schema["required"] = req
    instance = {}
    for n in names:
        mode = draw(st.integers(0, 5))
        if mode == 0:
            continue                      # omitted property
        instance[n] = draw(_value_for(props[n]))
    if draw(st.integers(0, 4)) == 0:
        instance["extra_prop"] = 1        # open-object extra (allowed)
    return schema, instance


def _ref_verdict(ref_sdk, schema, instance) -> bool:
    import copy

    from json_structure.instance_validator import (
        JSONStructureInstanceValidator)

    # the reference mutates the schema dict in place (auto-appends $uses)
    v = JSONStructureInstanceValidator(copy.deepcopy(schema), extended=True)
    v.validate_instance(instance)
    return not v.errors


def _bool_as_number(schema, instance) -> bool:
    """DOCUMENTED DIVERGENCE region: a Python bool offered to a numeric
    type.  The reference's ``isinstance(instance, int)`` accepts True/False
    as int32/int64/double (bool subclasses int — instance_validator.py:362)
    while the engine treats JSON true/false as type-mismatched with every
    numeric type.  Pinned by test_bool_int_divergence_documented; excluded
    from the verdict fuzz."""
    for name, node in schema["properties"].items():
        if node["type"] in ("int32", "int64", "double") and \
                isinstance(instance.get(name), bool):
            return True
    return False


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(case())
def test_kernel_matches_reference_verdict(ref_sdk_session, c):
    from hypothesis import assume

    schema, instance = c
    assume(not _bool_as_number(schema, instance))
    from sdk_spark.rowcheck import RowChecker

    mine = RowChecker(schema, extended=True).check(instance) == []
    try:
        ref = _ref_verdict(ref_sdk_session, schema, instance)
    except TypeError:
        # reference crash region (len() on a non-array, etc.), pinned by
        # test_constraint_on_mismatched_type_crash_documented
        return
    assert mine == ref, (
        f"verdict diverged (engine={'VALID' if mine else 'INVALID'}, "
        f"reference={'VALID' if ref else 'INVALID'})\n"
        f"schema={schema}\ninstance={instance}")


def test_bool_int_divergence_documented(ref_sdk_session):
    """DOCUMENTED DIVERGENCE (found by this fuzz): JSON ``true`` against a
    numeric type.  Reference: VALID — ``isinstance(True, int)`` is True in
    Python, so bools sail through every int/double check
    (instance_validator.py:343-366).  Engine: INVALID — JSON booleans and
    numbers are distinct types, and on Spark a boolean can never occupy a
    numeric column at all; the kernel mirrors that typed-column reality."""
    schema = {"$schema": META, "$id": "https://fuzz.local/b", "name": "B",
              "type": "object", "properties": {"v": {"type": "int32"}}}
    assert _ref_verdict(ref_sdk_session, schema, {"v": True})
    from sdk_spark.rowcheck import RowChecker

    codes = [f.code for f in
             RowChecker(schema, extended=True).check({"v": True})]
    assert codes == ["INSTANCE_TYPE_MISMATCH"]


@pytest.fixture(scope="module")
def ref_sdk_session(ref_sdk):
    return ref_sdk


def test_fuzz_region_is_meaningful(ref_sdk_session):
    """Guard: the generator actually produces both verdicts (a fuzz that
    only ever generates VALID cases proves nothing)."""
    from hypothesis import find

    from sdk_spark.rowcheck import RowChecker

    def verdict_is(target):
        def pred(c):
            schema, instance = c
            return (RowChecker(schema, extended=True)
                    .check(instance) == []) is target
        return pred

    find(case(), verdict_is(True))
    find(case(), verdict_is(False))


def test_constraint_on_mismatched_type_crash_documented(ref_sdk_session):
    """DOCUMENTED DIVERGENCE (found by this fuzz): a size constraint
    meeting a type-mismatched value.  Reference: the JSONStructureValidation
    addin applies ``len(instance) > maxItems`` without re-checking the
    instance is a sequence, so ``maxItems`` against a bool raises
    TypeError — the validator *crashes* instead of reporting
    (instance_validator.py:942).  Engine: one INSTANCE_TYPE_MISMATCH row,
    size constraints skipped — at 10^12 rows a crash on the first
    malformed row is not an option; every row must produce a verdict."""
    import pytest as _pytest

    schema = {"$schema": META, "$id": "https://fuzz.local/c", "name": "C",
              "$uses": ["JSONStructureValidation"], "type": "object",
              "properties": {"v": {"type": "array",
                                   "items": {"type": "string"},
                                   "maxItems": 2}}}
    with _pytest.raises(TypeError):
        _ref_verdict(ref_sdk_session, schema, {"v": True})
    from sdk_spark.rowcheck import RowChecker

    codes = [f.code for f in
             RowChecker(schema, extended=True).check({"v": True})]
    assert codes == ["INSTANCE_TYPE_MISMATCH"]


# ---------------------------------------------------------------------------
# richer region: nested objects, maps, conditional composition
# ---------------------------------------------------------------------------

@st.composite
def _nested_property(draw):
    depth_kind = draw(st.sampled_from(["flat", "object", "map"]))
    if depth_kind == "flat":
        return draw(_property())
    if depth_kind == "object":
        names = draw(st.lists(st.sampled_from(["x", "y"]), min_size=1,
                              max_size=2, unique=True))
        props = {n: draw(_property()) for n in names}
        node = {"type": "object", "properties": props}
        req = draw(st.lists(st.sampled_from(names), unique=True,
                            max_size=len(names)))
        if req:
            node["required"] = req
        return node
    return {"type": "map", "values": draw(_property())}


@st.composite
def _nested_value(draw, node):
    t = node["type"]
    if t == "object":
        out = {}
        for n, sub in node["properties"].items():
            if draw(st.integers(0, 4)):
                out[n] = draw(_value_for(sub))
        return out
    if t == "map":
        n = draw(st.integers(0, 3))
        return {f"k{i}": draw(_value_for(node["values"]))
                for i in range(n)}
    return draw(_value_for(node))


@st.composite
def nested_case(draw):
    names = draw(st.lists(st.sampled_from(_NAMES), min_size=1,
                          max_size=3, unique=True))
    props = {n: draw(_nested_property()) for n in names}
    schema = {"$schema": META, "$id": "https://fuzz.local/n", "name": "N",
              "$uses": ["JSONStructureValidation"],
              "type": "object", "properties": props}
    instance = {}
    for n in names:
        if draw(st.integers(0, 5)):
            instance[n] = draw(_nested_value(props[n]))
    return schema, instance


def _contains_bool_as_number(node, value) -> bool:
    t = node.get("type")
    if t in ("int32", "int64", "double"):
        return isinstance(value, bool)
    if t == "object" and isinstance(value, dict):
        return any(_contains_bool_as_number(sub, value[n])
                   for n, sub in node.get("properties", {}).items()
                   if n in value)
    if t == "map" and isinstance(value, dict):
        return any(_contains_bool_as_number(node["values"], v)
                   for v in value.values())
    if t == "array" and isinstance(value, list):
        return any(_contains_bool_as_number(node["items"], v)
                   for v in value)
    return False


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(nested_case())
def test_kernel_matches_reference_nested(ref_sdk_session, c):
    from hypothesis import assume

    schema, instance = c
    assume(not any(_contains_bool_as_number(sub, instance[n])
                   for n, sub in schema["properties"].items()
                   if n in instance))
    from sdk_spark.rowcheck import RowChecker

    mine = RowChecker(schema, extended=True).check(instance) == []
    try:
        ref = _ref_verdict(ref_sdk_session, schema, instance)
    except TypeError:
        return      # pinned crash region
    assert mine == ref, (
        f"verdict diverged (engine={'VALID' if mine else 'INVALID'}, "
        f"reference={'VALID' if ref else 'INVALID'})\n"
        f"schema={schema}\ninstance={instance}")


@st.composite
def conditional_case(draw):
    """(schema, instance) pairs whose schema wraps ONE property in a
    conditional composition (if/then/else, oneOf, anyOf, allOf, not)
    with validation addins INSIDE the branches — the region where the
    r4-fixed kernel bugs (inverted if/then direction, $uses not
    inherited into then/else) lived undetected by the corpus."""
    name = draw(st.sampled_from(_NAMES))
    kind = draw(st.sampled_from(["string", "int32"]))

    def node():
        if kind == "string":
            return {"type": "string", **draw(_string_constraints())}
        return {"type": "int32", **draw(_numeric_constraints("int32"))}

    def branch():
        return {"type": "object", "properties": {name: node()}}

    schema = {"$schema": META, "$id": "https://fuzz.local/c", "name": "C",
              "$uses": ["JSONStructureConditionalComposition",
                        "JSONStructureValidation"],
              "type": "object", "properties": {name: {"type": kind}}}
    shape = draw(st.sampled_from(
        ["if_then", "if_else", "if_then_else",
         "oneOf", "anyOf", "allOf", "not"]))
    if shape.startswith("if"):
        schema["if"] = branch()
        if "then" in shape:
            schema["then"] = branch()
        if "else" in shape:
            schema["else"] = branch()
    elif shape == "not":
        schema["not"] = branch()
    else:
        schema[shape] = [branch()
                         for _ in range(draw(st.integers(1, 3)))]
    # bias the value toward a (random) branch's constraint boundaries
    instance = {name: draw(_value_for(node()))}
    return schema, instance


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(conditional_case())
def test_kernel_matches_reference_on_conditionals(ref_sdk_session, c):
    from hypothesis import assume

    schema, instance = c
    assume(not _bool_as_number(schema, instance))
    from sdk_spark.rowcheck import RowChecker

    mine = RowChecker(schema, extended=True).check(instance) == []
    try:
        ref = _ref_verdict(ref_sdk_session, schema, instance)
    except TypeError:
        return          # reference crash region (pinned elsewhere)
    assert mine == ref, (
        f"conditional verdict diverged (engine="
        f"{'VALID' if mine else 'INVALID'}, "
        f"reference={'VALID' if ref else 'INVALID'})\n"
        f"schema={schema}\ninstance={instance}")
