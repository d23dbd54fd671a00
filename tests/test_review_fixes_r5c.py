"""Round-5 review sweep (second batch): catalyst-vs-kernel divergences in
the json-auto path and $uses wrapper, each reproduced against the Arrow row
kernel as the authority (it differentially tracks the reference validator).

Findings fixed and pinned here:
- string-family fields silently accepted non-string JSON tokens (from_json
  copies token text into StringType, so the null-coercion probe was blind)
- explicit JSON null flagged as mismatch even when the declared type admits
  null (union with 'null' / 'any')
- mistyped-but-present required fields double-reported (REQUIRED + mismatch)
- property names that break dotted column refs crashed instead of falling
  back to the kernel
- validate_auto's arrow fallback rendered key/metadata columns into the row
  JSON (spurious INSTANCE_ADDITIONAL_PROPERTY)
- $uses: scalar non-string values dropped instead of wrapped (kernel wraps);
  add-in-vs-add-in property conflicts silently last-wins with no finding;
  kernel-fallback branches double-emitted the wrapper's extra rows and saw a
  pre-merged schema (fabricating conflict findings)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _kv(viol, key="k"):
    return {(r[key], r["constraint_id"]) for r in viol.collect()}


def _kcv(viol, key="k"):
    return {(r[key], r["constraint_id"], r["value"]) for r in viol.collect()}


def _kernel(spark, df, schema, key_cols=("k",)):
    from sdk_spark.operators.jsonbatch import validate_json_column

    return validate_json_column(df, "doc", schema, key_cols=list(key_cols))


def test_json_auto_string_field_rejects_nonstring_tokens(spark):
    """kernel parity: _h_string / _h_bigint demand a JSON *string* token;
    from_json's text-coercion must not make 123 pass as 'string'."""
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"name": {"type": "string"},
                          "big": {"type": "int64"}}}
    df = spark.createDataFrame(
        [("r1", '{"name": 123}'),           # number token for string: flag
         ("r2", '{"name": true}'),          # bool token: flag
         ("r3", '{"name": {"a": 1}}'),      # object token: flag
         ("r4", '{"name": [1]}'),           # array token: flag
         ("r5", '{"name": null}'),          # explicit null: flag (no union)
         ("r6", '{"name": "123"}'),         # real string: clean
         ("r7", '{"big": 123}'),            # int64 is string-backed: flag
         ("r8", '{"big": "123"}')],         # digit string: clean
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "catalyst"
    got = _kv(viol)
    kernel = _kv(_kernel(spark, df, doc))
    assert got == kernel
    assert got == {(r, "INSTANCE_TYPE_MISMATCH")
                   for r in ("r1", "r2", "r3", "r4", "r5", "r7")}


def test_json_auto_union_with_null_accepts_explicit_null(spark):
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"s": {"type": ["string", "null"]},
                          "b": {"type": ["boolean", "null"]}}}
    df = spark.createDataFrame(
        [("r1", '{"s": null}'),        # union admits null: clean
         ("r2", '{"s": "x"}'),         # string branch: clean
         ("r3", '{"s": 5}'),           # number fits neither branch: flag
         ("r4", '{"b": null}'),        # clean
         ("r5", '{"b": true}'),        # clean
         ("r6", '{"b": 5}')],          # flag
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "catalyst"
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, doc))
    # a token that fits no branch of a type union is UNION_NO_MATCH
    # (kernel rowcheck.py:239-246), not a plain TYPE_MISMATCH
    assert got == {("r3", "INSTANCE_UNION_NO_MATCH"),
                   ("r6", "INSTANCE_UNION_NO_MATCH")}


def test_json_auto_mistyped_fields_get_kernel_exact_findings(spark):
    """Mistyped-token rows reroute to the kernel, whose add-in semantics
    are reference-exact (verified against the reference validator this
    round): `pattern` on a non-string token reports (re.search TypeError →
    reference 'Invalid pattern constraint', instance_validator.py:904-910)
    IN ADDITION to the type mismatch, while a mistyped `date` reports only
    DATE_FORMAT_INVALID (rx handler, no separate TYPE_MISMATCH)."""
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "$uses": ["JSONStructureValidation"],
           "type": "object", "name": "R",
           "properties": {"code": {"type": "string",
                                   "pattern": "^[a-z]+$"},
                          "d": {"type": "date"}}}
    df = spark.createDataFrame(
        [("r1", '{"code": 123}'),     # TM + unevaluable-pattern finding
         ("r2", '{"d": 20240101}'),   # date rx handler: format-invalid only
         ("r3", '{"code": "ok"}')],   # clean
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "catalyst"
    got = _kv(viol)
    assert got == _kv(_kernel(spark, df, doc))
    assert got == {("r1", "INSTANCE_TYPE_MISMATCH"),
                   ("r1", "INSTANCE_STRING_PATTERN_MISMATCH"),
                   ("r2", "INSTANCE_DATE_FORMAT_INVALID")}


def test_json_auto_required_present_but_mistyped_is_mismatch_only(spark):
    """kernel required sees `"k" in value`: a present-but-uncoercible field
    must not ALSO report REQUIRED_PROPERTY_MISSING."""
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"a": {"type": "int32"},
                          "s": {"type": "string"}},
           "required": ["a", "s"]}
    df = spark.createDataFrame(
        [("r1", '{"a": "abc", "s": "ok"}'),   # present, mistyped: 1 finding
         ("r2", '{"s": "ok"}'),               # absent: REQUIRED
         ("r3", '{"a": 1, "s": 7}'),          # string field mistyped
         ("r4", '{"a": 1, "s": "ok"}')],      # clean
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "catalyst"
    rows = sorted((r["k"], r["constraint_id"]) for r in viol.collect())
    assert rows == [("r1", "INSTANCE_TYPE_MISMATCH"),
                    ("r2", "INSTANCE_REQUIRED_PROPERTY_MISSING"),
                    ("r3", "INSTANCE_TYPE_MISMATCH")]
    assert _kv(viol) == _kv(_kernel(spark, df, doc))


def test_json_auto_hostile_property_names_fall_back(spark):
    """a.b as a property name breaks F.col('__doc.a.b'): must route to the
    kernel, not crash with AnalysisException."""
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"a.b": {"type": "string"}},
           "required": ["a.b"]}
    df = spark.createDataFrame(
        [("r1", '{"a.b": "ok"}'), ("r2", '{"a.b": 5}'), ("r3", '{}')],
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "arrow"
    assert _kv(viol) == {("r2", "INSTANCE_TYPE_MISMATCH"),
                         ("r3", "INSTANCE_REQUIRED_PROPERTY_MISSING")}


def test_json_auto_carrier_name_collision_falls_back(spark):
    from sdk_spark.plans.auto import validate_json_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"__keys": {"type": "string"}}}
    df = spark.createDataFrame([("r1", '{"__keys": 5}')],
                               "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "arrow"
    assert _kv(viol) == {("r1", "INSTANCE_TYPE_MISMATCH")}


def test_validate_auto_arrow_fallback_excludes_undeclared_columns(spark):
    """key/metadata columns are not document properties: the arrow fallback
    must not fabricate INSTANCE_ADDITIONAL_PROPERTY for them."""
    from sdk_spark.plans.auto import validate_auto

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "$uses": ["JSONStructureValidation"],
           "type": "object", "name": "R",
           "additionalProperties": False,
           # non-scalar const cannot lower: forces the arrow fallback
           "properties": {"cfg": {"type": "object", "name": "C",
                                  "properties": {"a": {"type": "int32"}},
                                  "const": {"a": 1}},
                          "name": {"type": "string"}}}
    df = spark.createDataFrame(
        [("r1", "ok", {"a": 1}, "meta1"),
         ("r2", "ok", {"a": 2}, "meta2")],
        "rid string, name string, cfg struct<a:int>, extra_meta string")
    viol, path = validate_auto(df, doc, ["rid"])
    assert path == "arrow"
    got = {(r["rid"], r["constraint_id"], r["path"]) for r in viol.collect()}
    # no finding may mention the undeclared carrier columns
    assert not [g for g in got if "rid" in g[2] or "extra_meta" in g[2]], got
    assert ("r2", "INSTANCE_CONST_MISMATCH", "#/cfg") in got or \
        any(r == "r2" for r, _c, _p in got)  # const violation surfaced
    assert not [g for g in got if g[0] == "r1"], got


def test_instance_uses_scalar_values_match_kernel(spark):
    """$uses: 5 wraps to [5] (kernel rule) => USES_NOT_OFFERED with the
    json-rendered scalar; falsy scalars are 'unset'; a STRING $uses whose
    text looks like JSON ('123') stays a string extension name."""
    from sdk_spark.plans.auto import validate_json_with_instance_uses

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R",
           "properties": {"a": {"type": "int32"}},
           "$offers": {"Extra": {"type": "object", "name": "X",
                                 "properties": {"x": {"type": "int32"}}}}}
    df = spark.createDataFrame(
        [("r1", '{"$uses": 5, "a": 1}'),
         ("r2", '{"$uses": "123", "a": 1}'),
         ("r3", '{"$uses": false, "a": 1}'),
         ("r4", '{"$uses": 0, "a": 1}'),
         ("r5", '{"$uses": null, "a": 1}'),
         ("r6", '{"$uses": "Extra", "a": 1, "x": 2}')],
        "k string, doc string")
    viol, _mode = validate_json_with_instance_uses(df, "doc", doc, ["k"],
                                                   extended=True)
    got = _kcv(viol)
    kernel = _kcv(_kernel(spark, df, doc))
    assert got == kernel
    assert got == {("r1", "INSTANCE_USES_NOT_OFFERED", "5"),
                   ("r2", "INSTANCE_USES_NOT_OFFERED", '"123"')}


def test_instance_uses_addin_conflict_is_a_finding_not_last_wins(spark):
    """two add-ins both defining 'p': kernel emits a per-row conflict
    finding and keeps validating last-wins — the wrapper must match, for
    declared-vs-addin AND addin-vs-addin collisions."""
    from sdk_spark.plans.auto import validate_json_with_instance_uses

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R",
           "properties": {"a": {"type": "int32"}},
           "$offers": {
               "X": {"type": "object", "name": "X",
                     "properties": {"p": {"type": "int32"}}},
               "Z": {"type": "object", "name": "Z",
                     "properties": {"p": {"type": "string"}}}}}
    df = spark.createDataFrame(
        [("r1", '{"$uses": ["X", "Z"], "a": 1, "p": "s"}'),
         ("r2", '{"$uses": ["X"], "a": 1, "p": 3}'),
         ("r3", '{"$uses": ["X", "Z"], "a": 1, "p": 3}')],
        "k string, doc string")
    viol, _mode = validate_json_with_instance_uses(df, "doc", doc, ["k"],
                                                   extended=True)
    got = _kcv(viol)
    kernel = _kcv(_kernel(spark, df, doc))
    assert got == kernel
    conflict = '"add-in property \'p\' conflicts"'
    assert ("r1", "INSTANCE_USES_NOT_OFFERED", conflict) in got
    assert ("r3", "INSTANCE_USES_NOT_OFFERED", conflict) in got
    # last-wins: Z's string 'p' governs => r3's p=3 is a mismatch, r1 clean
    assert ("r3", "INSTANCE_TYPE_MISMATCH", "3") in got
    assert not [g for g in got if g[0] == "r2" and g[1] != "INSTANCE_USES_NOT_OFFERED"]


def test_instance_uses_kernel_branch_single_emission(spark):
    """a branch that cannot lower goes to the kernel with the ORIGINAL
    schema and no wrapper extras: exactly one USES_NOT_OFFERED per row,
    never two, and no fabricated conflict findings from a pre-merged
    branch schema."""
    from sdk_spark.plans.auto import validate_json_with_instance_uses

    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R",
           # non-scalar const forces every branch off the catalyst path
           "properties": {"cfg": {"type": "object", "name": "C",
                                  "properties": {"a": {"type": "int32"}},
                                  "const": {"a": 1}}},
           "$offers": {"Extra": {"type": "object", "name": "X",
                                 "properties": {"x": {"type": "int32"}}}}}
    df = spark.createDataFrame(
        [("r1", '{"$uses": ["Nope"], "cfg": {"a": 1}}'),
         ("r2", '{"$uses": ["Extra"], "cfg": {"a": 1}, "x": 2}')],
        "k string, doc string")
    viol, mode = validate_json_with_instance_uses(df, "doc", doc, ["k"],
                                                  extended=True)
    assert mode == "arrow"
    rows = [(r["k"], r["constraint_id"]) for r in viol.collect()]
    assert sorted(rows) == [("r1", "INSTANCE_USES_NOT_OFFERED")]
    assert _kcv(viol) == _kcv(_kernel(spark, df, doc))
