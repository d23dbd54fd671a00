"""Schema-side conformance corpus (reference test-assets/schemas).

Mirrors the reference harness semantics
(reference: python/tests/test_assets.py:78-90, 194-207, 321-402, 466-481):
invalid schemas must fail, validation schemas must pass, warning schemas
must warn with SCHEMA_EXTENSION_KEYWORD_NOT_ENABLED, adversarial schemas
must not crash (a listed subset must fail).
"""

from __future__ import annotations

import pytest

from sdk_spark import errors as E
from sdk_spark.schema.validator import SchemaChecker

from .conftest import TEST_ASSETS, corpus_available, load_json

pytestmark = pytest.mark.skipif(not corpus_available(), reason="test-assets missing")

INVALID = sorted((TEST_ASSETS / "schemas" / "invalid").glob("*.struct.json"))
VALIDATION = sorted((TEST_ASSETS / "schemas" / "validation").glob("*.struct.json"))
WARNINGS = sorted((TEST_ASSETS / "schemas" / "warnings").glob("*-without-uses.struct.json"))
ADVERSARIAL = sorted((TEST_ASSETS / "schemas" / "adversarial").glob("*.struct.json"))

# reference: python/tests/test_assets.py:418-423
MUST_FAIL_ADVERSARIAL = {
    "ref-to-nowhere.struct.json",
    "malformed-json-pointer.struct.json",
    "self-referencing-extends.struct.json",
    "extends-circular-chain.struct.json",
}


@pytest.mark.parametrize("schema_file", INVALID, ids=lambda f: f.name)
def test_invalid_schema_fails(schema_file):
    errs = SchemaChecker(extended=True).validate(load_json(schema_file))
    assert errs, f"{schema_file.name} should be invalid"


@pytest.mark.parametrize("schema_file", VALIDATION, ids=lambda f: f.name)
def test_validation_schema_passes(schema_file):
    errs = SchemaChecker(extended=True).validate(load_json(schema_file))
    assert not errs, f"{schema_file.name} should be valid: {[str(e) for e in errs]}"


@pytest.mark.parametrize("schema_file", WARNINGS, ids=lambda f: f.name)
def test_warning_schema_warns(schema_file):
    checker = SchemaChecker(extended=True, warn_on_unused_extension_keywords=True)
    errs = checker.validate(load_json(schema_file))
    assert not errs, f"{schema_file.name} should only warn: {[str(e) for e in errs]}"
    assert checker.warnings, f"{schema_file.name} should produce warnings"
    assert all(w.code == E.SCHEMA_EXTENSION_KEYWORD_NOT_ENABLED for w in checker.warnings)


def test_warning_disabled_option():
    schema = load_json(TEST_ASSETS / "schemas" / "warnings" / "numeric-minimum-without-uses.struct.json")
    checker = SchemaChecker(extended=True, warn_on_unused_extension_keywords=False)
    assert not checker.validate(schema)
    assert not checker.warnings


@pytest.mark.parametrize("schema_file", ADVERSARIAL, ids=lambda f: f.name)
def test_adversarial_schema(schema_file):
    errs = SchemaChecker(extended=True).validate(load_json(schema_file))
    assert isinstance(errs, list)
    if schema_file.name in MUST_FAIL_ADVERSARIAL:
        assert errs, f"{schema_file.name} must fail schema validation"
