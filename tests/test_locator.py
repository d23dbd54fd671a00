"""SourceLocator: JSON pointer → (line, col).

Behavioral parity with the reference locator (reference: python/tests/
test_json_source_locator.py, 41 cases): property/array/nested lookups,
#-anchored pointers, escapes, unicode, malformed input. Re-implemented
tests against our own API (locate returns (line, col) tuples, 1-based).
"""

from __future__ import annotations

import pytest

from sdk_spark.schema.locator import JsonSourceError, SourceLocator, locate_issues


def loc(text, ptr):
    return SourceLocator(text).locate(ptr)


def test_simple_property():
    assert loc('{\n  "name": "test"\n}', "/name") == (2, 11)


def test_pointer_with_anchor():
    assert loc('{\n  "name": "test"\n}', "#/name") == (2, 11)


def test_nested_property():
    t = '{\n  "person": {\n    "name": "Alice"\n  }\n}'
    assert loc(t, "/person/name")[0] == 3
    assert loc(t, "/person")[0] == 2


def test_array_elements():
    t = '{\n  "items": [\n    "first",\n    "second"\n  ]\n}'
    assert loc(t, "/items/0")[0] == 3
    assert loc(t, "/items/1")[0] == 4
    assert loc('["a", "b", "c"]', "/0") == (1, 2)
    assert loc('["a", "b", "c"]', "/2") == (1, 12)


def test_object_in_array():
    t = '{\n  "users": [\n    {"name": "Alice"},\n    {"name": "Bob"}\n  ]\n}'
    assert loc(t, "/users/1/name")[0] == 4


def test_missing_paths_return_none():
    assert loc('{"name": "x"}', "/nope") is None
    assert loc('["a", "b"]', "/5") is None
    assert loc('["a", "b"]', "/x") is None


def test_root_value():
    assert loc('  {"a": 1}', "") == (1, 3)
    assert loc("[1, 2]", "#") == (1, 1)


def test_key_position():
    t = '{\n  "name": "test"\n}'
    assert SourceLocator(t).locate_key("/name") == (2, 3)


def test_escaped_keys_and_pointer_escapes():
    t = '{"a/b": 1, "c~d": 2}'
    assert loc(t, "/a~1b") == (1, 9)
    assert loc(t, "/c~0d") == (1, 19)


def test_unicode_and_string_escapes():
    t = '{"k\\u00e9": "caf\\u00e9", "nl": "a\\nb"}'
    assert loc(t, "/ké") is not None
    assert loc(t, "/nl") is not None


def test_numbers_booleans_null():
    t = '{"i": -12, "f": 1.5e3, "t": true, "n": null, "f2": false}'
    s = SourceLocator(t)
    for ptr in ("/i", "/f", "/t", "/n", "/f2"):
        assert s.locate(ptr) is not None


def test_deep_nesting():
    t = '{"a": {"b": {"c": [0, {"d": 9}]}}}'
    assert loc(t, "/a/b/c/1/d") == (1, 29)


def test_whitespace_variants():
    t = '{\r\n\t"x" :\t42 ,\r\n "y":[ 1 , 2 ]}'
    s = SourceLocator(t)
    assert s.locate("/x") is not None
    assert s.locate("/y/1") is not None


def test_malformed_inputs_raise():
    for bad in ('{"a": }', '{"a" 1}', "[1, 2", '{"a": "x}', "tru",
                '{"a": 1} extra', ""):
        with pytest.raises(JsonSourceError):
            SourceLocator(bad)


def test_duplicate_keys_last_wins():
    t = '{"a": 1, "a": 2}'
    assert loc(t, "/a") == (1, 15)


def test_empty_containers():
    s = SourceLocator('{"o": {}, "a": []}')
    assert s.locate("/o") == (1, 7)
    assert s.locate("/a") == (1, 16)
    assert s.locate("/o/x") is None


def test_locate_issues_walks_up():
    from sdk_spark.schema.validator import SchemaChecker

    text = ('{\n'
            '  "$schema": "https://json-structure.org/meta/extended/v0/#",\n'
            '  "$id": "https://t.local/x",\n'
            '  "name": "X",\n'
            '  "type": "object",\n'
            '  "properties": {\n'
            '    "s": {"type": "string", "pattern": "[unclosed"}\n'
            '  },\n'
            '  "$uses": ["JSONStructureValidation"]\n'
            '}\n')
    import json

    issues = SchemaChecker(extended=True).validate(json.loads(text))
    assert issues, "expected the bad regex to be flagged"
    located = locate_issues(text, issues)
    assert any(i["line"] == 7 for i in located), located
