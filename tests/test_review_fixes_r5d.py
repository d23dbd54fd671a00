"""Round-5 review sweep (third batch): json-auto reroute edges found by a
high-effort review of commit 766fcb9, each adjudicated against the Arrow
row kernel (and the reference validator where it does not crash).

Findings fixed and pinned here:
- dict-valued ``$uses`` members crashed the kernel AND the reference with
  TypeError (unhashable in set/dict membership); one poison row must not
  kill a distributed task — both kernel and wrapper now report
  USES_NOT_OFFERED (same policy as the r4 NaN-decimal fix)
- the ``__keys`` carrier column leaked into ``plan.validate``'s
  every-column conditional struct (patternProperties bail-out), tripping
  branch object checks on clean rows
- explicitly-null REQUIRED fields whose type admits null were reported
  REQUIRED_PROPERTY_MISSING by the compiled plan (kernel sees the key
  present); such rows now reroute to the kernel, and names containing
  '/' no longer escape the fix (the old regex suppression did)
- ``validate_auto``'s arrow fallback rendered only ``properties`` names,
  fabricating REQUIRED findings for required-but-undeclared columns
- union branches written as {"$ref": ...} never joined the string-token
  probe, silently accepting mistyped tokens
- duplicate-JSON-key documents blind ``try_parse_json`` (NULL variant)
  while json_object_keys/from_json still parse — those rows now reroute
  to the kernel (json.loads last-wins), in both the auto path and the
  $uses wrapper
- a schema property named 'valid'/'violations'/'violation_count' hit the
  compiler's ValueError clash guard instead of falling back to the kernel
- the wrapper's core-metaschema $uses gate used endswith('/core/v0/#')
  where the kernel tests exact equality with META_CORE
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _kv(viol, key="k"):
    return {(r[key], r["constraint_id"]) for r in viol.collect()}


def _kernel(spark, df, schema, key_cols=("k",)):
    from sdk_spark.operators.jsonbatch import validate_json_column

    return validate_json_column(df, "doc", schema, key_cols=list(key_cols))


def _schema(props, **root):
    return {"$id": "https://x/s",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "type": "object", "name": "R", "properties": props, **root}


def test_kernel_dict_uses_member_is_finding_not_crash():
    """The reference raises TypeError here (instance_validator.py:1211);
    the engine reports the member as not-offered instead."""
    from sdk_spark.rowcheck import RowChecker

    schema = _schema({"a": {"type": "int32"}},
                     **{"$offers": {"X": {"type": "object", "name": "X",
                                          "properties": {"p": {"type": "int32"}}}}})
    rc = RowChecker(schema, extended=True)
    got = [(f.code, f.value) for f in rc.check({"$uses": {"a": 1}, "a": 1})]
    assert got == [("INSTANCE_USES_NOT_OFFERED", '{"a": 1}')]
    got = [(f.code, f.value) for f in rc.check({"$uses": [{"a": 1}, "X"],
                                                "a": 1, "p": 2})]
    assert got == [("INSTANCE_USES_NOT_OFFERED", '{"a": 1}')]


def test_instance_uses_wrapper_dict_member_matches_kernel(spark):
    from sdk_spark.plans.auto import validate_json_with_instance_uses

    schema = _schema({"a": {"type": "int32"}},
                     **{"$offers": {"X": {"type": "object", "name": "X",
                                          "properties": {"p": {"type": "int32"}}}}})
    df = spark.createDataFrame(
        [("r1", '{"$uses": {"a": 1}, "a": 1}'),
         ("r2", '{"$uses": [{"a": 1}, "X"], "a": 1, "p": 2}'),
         ("r3", '{"$uses": ["X"], "a": 1, "p": 2}')],
        "k string, doc string")
    viol, _mode = validate_json_with_instance_uses(df, "doc", schema, ["k"],
                                                   extended=True)
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, schema))
    assert got == {("r1", "INSTANCE_USES_NOT_OFFERED"),
                   ("r2", "INSTANCE_USES_NOT_OFFERED")}


def test_json_auto_carrier_does_not_leak_into_conditionals(spark):
    """a >8-deep conditional nest keeps the compiler's every-column struct
    (_cond_prop_names depth bail-out, r5b); the __keys carrier must not be
    in that struct — a branch maxProperties that admits the key column +
    declared property would trip on the extra carrier."""
    from sdk_spark.plans.auto import validate_json_auto

    nest: dict = {"type": "object", "maxProperties": 2}
    for _ in range(9):
        nest = {"allOf": [nest]}
    schema = _schema({"a": {"type": "string"}},
                     **{"$uses": ["JSONStructureConditionalComposition",
                                  "JSONStructureValidation"], **nest})
    df = spark.createDataFrame(
        [("r1", '{"a": "ok"}'), ("r2", '{"a": "also ok"}')],
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", schema, ["k"])
    assert path == "catalyst"
    assert _kv(viol) == set()


def test_json_auto_required_explicit_null_union_matches_kernel(spark):
    """required + type ['string','null'] + explicit null: kernel sees the
    key present (no REQUIRED finding); also pins names containing '/',
    which the old path-regex suppression missed."""
    from sdk_spark.plans.auto import validate_json_auto

    schema = _schema({"s": {"type": ["string", "null"]},
                      "a/b": {"type": ["string", "null"]}},
                     required=["s", "a/b"])
    df = spark.createDataFrame(
        [("r1", '{"s": null, "a/b": null}'),   # both present-null: clean
         ("r2", '{"s": "x", "a/b": "y"}'),     # clean
         ("r3", '{"a/b": "y"}'),               # s absent: REQUIRED
         ("r4", '{"s": 5, "a/b": null}')],     # mistyped union: kernel code
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", schema, ["k"])
    assert path == "catalyst"
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, schema))
    assert got == {("r3", "INSTANCE_REQUIRED_PROPERTY_MISSING"),
                   ("r4", "INSTANCE_UNION_NO_MATCH")}


def test_validate_auto_arrow_fallback_renders_required_columns(spark):
    """a non-scalar const forces the arrow fallback; a required column that
    is not in properties must still render into the row JSON (undeclared
    metadata columns must still NOT render — r5c behavior retained)."""
    from sdk_spark.plans.auto import validate_auto

    schema = _schema({"cfg": {"type": "object", "name": "C",
                              "properties": {"x": {"type": "int32"}},
                              "const": {"x": 1}}},
                     required=["cfg", "b"], additionalProperties=False)
    df = spark.createDataFrame(
        [("r1", {"x": 1}, "bb", "meta")],
        "rid string, cfg struct<x:int>, b string, extra_meta string")
    viol, path = validate_auto(df, schema, ["rid"])
    assert path == "arrow"
    got = {(r["rid"], r["constraint_id"], r["path"]) for r in viol.collect()}
    assert not [g for g in got
                if g[1] == "INSTANCE_REQUIRED_PROPERTY_MISSING"], got
    # the undeclared metadata column must not fabricate an extra-property
    # finding even though required-name rendering widened the declared set
    assert not [g for g in got if "extra_meta" in g[2]], got


def test_json_auto_refd_union_branch_joins_string_probe(spark):
    """type: ['null', {'$ref': ...}] resolving to a string-family type must
    reroute non-string tokens (from_json text coercion blinds probe (a))."""
    from sdk_spark.plans.auto import validate_json_auto

    schema = _schema({"s": {"type": ["null", {"$ref": "#/definitions/Nm"}]}},
                     definitions={"Nm": {"type": "string", "name": "Nm"}})
    df = spark.createDataFrame(
        [("r1", '{"s": 123}'),      # number under $ref'd string: flag
         ("r2", '{"s": "ok"}'),     # clean
         ("r3", '{"s": null}')],    # union admits null: clean
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", schema, ["k"])
    assert path == "catalyst"
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, schema))
    assert got == {("r1", "INSTANCE_UNION_NO_MATCH")}


def test_json_auto_duplicate_json_keys_reroute_to_kernel(spark):
    """try_parse_json -> NULL on duplicate keys while json_object_keys
    parses; such docs must get kernel (json.loads last-wins) semantics."""
    from sdk_spark.plans.auto import validate_json_auto

    schema = _schema({"a": {"type": "int32", "minimum": 5},
                      "s": {"type": "string"}},
                     **{"$uses": ["JSONStructureValidation"]})
    df = spark.createDataFrame(
        [("r1", '{"a": 1, "a": 9, "s": "x"}'),   # last-wins 9: clean
         ("r2", '{"a": 9, "a": 1, "s": "x"}'),   # last-wins 1: MINIMUM
         ("r3", '{"a": 9, "s": "x"}')],          # clean
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", schema, ["k"])
    assert path == "catalyst"
    assert _kv(viol) == _kv(_kernel(spark, df, schema))


def test_json_auto_compiler_output_name_falls_back(spark):
    """a property named 'valid' trips the compiler's ValueError clash
    guard; the auto path must route to the kernel, not crash."""
    from sdk_spark.plans.auto import validate_json_auto

    schema = _schema({"valid": {"type": "boolean"}})
    df = spark.createDataFrame(
        [("r1", '{"valid": true}'), ("r2", '{"valid": 3}')],
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", schema, ["k"])
    assert path == "arrow"
    assert _kv(viol) == {("r2", "INSTANCE_TYPE_MISMATCH")}


def test_instance_uses_core_meta_gate_is_exact_equality(spark):
    """kernel gates ADDIN_NOT_SUPPORTED on $schema == META_CORE exactly
    (rowcheck.py:176); a foreign metaschema merely ENDING in /core/v0/#
    must not trip the wrapper's replica of that gate."""
    from sdk_spark.plans.auto import validate_json_with_instance_uses

    schema = {"$id": "https://x/s",
              "$schema": "https://example.com/meta/core/v0/#",
              "type": "object", "name": "R",
              "properties": {"a": {"type": "int32"}}}
    df = spark.createDataFrame(
        [("r1", '{"$uses": ["JSONStructureValidation"], "a": 1}')],
        "k string, doc string")
    viol, _mode = validate_json_with_instance_uses(df, "doc", schema, ["k"],
                                                   extended=True)
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, schema))
    assert ("r1", "INSTANCE_ADDIN_NOT_SUPPORTED") not in got
