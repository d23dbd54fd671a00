"""Concurrent use of the row kernel and schema checker.

Reference analogue: python/tests/test_thread_safety.py:17-50 (shared
validator across threads).  Our kernel keeps no mutable per-call state on
the instance, so one RowChecker can serve many threads.
"""

from __future__ import annotations

import concurrent.futures

from sdk_spark.rowcheck import RowChecker
from sdk_spark.schema.validator import SchemaChecker

SCHEMA = {
    "$schema": "https://json-structure.org/meta/extended/v0/#",
    "$id": "https://x/t", "name": "T",
    "$uses": ["JSONStructureValidation"],
    "type": "object",
    "properties": {
        "n": {"type": "int32", "minimum": 0, "maximum": 100},
        "s": {"type": "string", "pattern": "^[a-z]+$"},
    },
    "required": ["n"],
}


def test_shared_rowchecker_across_threads():
    rc = RowChecker(SCHEMA, extended=True)

    def work(i: int) -> tuple[bool, bool]:
        good = rc.is_valid({"n": i % 100, "s": "abc"})
        bad = rc.is_valid({"n": 500, "s": "ABC"})
        return good, bad

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(work, range(200)))
    assert all(g and not b for g, b in results)


def test_schema_checker_not_shared_state_leak():
    def work(_):
        checker = SchemaChecker(extended=True)
        errs = checker.validate(SCHEMA)
        return len(errs), len(checker.warnings)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(work, range(64)))
    assert all(e == 0 for e, _ in results)
