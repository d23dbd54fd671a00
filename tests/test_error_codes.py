"""Error-code parity with the reference catalog (assets/error-messages.json).

Every code the reference standardizes must map to a defined constant, and
every code the engine emits (compiler, kernel, schema checker) must be a
defined constant — no ad-hoc strings drifting onto neighboring codes.
"""

from __future__ import annotations

import json
import pathlib
import re

import pytest

from sdk_spark import errors as E

REF_CATALOG = pathlib.Path("/root/reference/assets/error-messages.json")


@pytest.mark.skipif(not REF_CATALOG.exists(), reason="reference catalog absent")
def test_all_reference_codes_defined():
    msgs = json.loads(REF_CATALOG.read_text())["messages"]
    assert len(msgs) >= 123
    undefined = [c for c in msgs if getattr(E, c, None) != c]
    assert not undefined, f"codes missing constants: {undefined}"
    for c in msgs:
        assert c in E.REFERENCE_MESSAGES


def _emitted_codes() -> set[str]:
    """Every INSTANCE_*/SCHEMA_*/ENGINE_* literal used by engine source."""
    pkg = pathlib.Path(__file__).resolve().parents[1] / "sdk_spark"
    used: set[str] = set()
    for py in pkg.rglob("*.py"):
        text = py.read_text()
        # attribute refs E.CODE / errors.CODE
        used.update(re.findall(r"\bE\.((?:INSTANCE|SCHEMA|ENGINE)_[A-Z0-9_]+)", text))
        # string literals of code shape
        used.update(re.findall(r"\"((?:INSTANCE|SCHEMA|ENGINE)_[A-Z0-9_]+)\"", text))
    return used


def test_every_emitted_code_is_defined():
    defined = {name for name in dir(E)
               if re.fullmatch(r"(INSTANCE|SCHEMA|ENGINE)_[A-Z0-9_]+", name)}
    used = _emitted_codes()
    # code-shaped strings inside errors.py itself are the definitions
    undefined = sorted(c for c in used if c not in defined)
    assert not undefined, f"emitted but undefined: {undefined}"


def test_corpus_expected_codes_are_defined():
    """Every _expectedError the conformance corpus references must exist."""
    from .conftest import TEST_ASSETS, corpus_available

    if not corpus_available():
        pytest.skip("test-assets missing")
    inst = TEST_ASSETS / "instances"
    codes = set()
    for f in inst.rglob("*.json"):
        try:
            data = json.loads(f.read_text())
        except ValueError:
            continue
        if isinstance(data, dict) and data.get("_expectedError"):
            codes.add(data["_expectedError"])
    assert codes, "corpus should reference expected error codes"
    undefined = sorted(c for c in codes if getattr(E, c, None) != c)
    assert not undefined, f"corpus codes without constants: {undefined}"
