"""Batch differential test: the json-auto hybrid path vs the Arrow kernel.

``validate_json_auto`` routes clean rows through the compiled Catalyst
plan and mistyped/unparseable rows through the row kernel; this test
generates one seeded batch of documents that exercises every routing
branch (clean, wrong-token-type per declared type, explicit null,
type unions with/without null, parse failures, undeclared properties,
validation add-ins on both clean and mistyped tokens) and asserts the
FULL finding set — (key, constraint_id, path) — equals what the kernel
alone produces.  The kernel is the authority: it is differentially
fuzzed against the reference validator (test_differential_fuzz.py).

One Spark plan over the whole batch, not per-example plans — the same
coverage at a fraction of the wall clock.
"""
from __future__ import annotations

import json
import random

import pytest

pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = {
    "$id": "https://x/fuzz",
    "$schema": "https://json-structure.org/meta/extended/v0/#",
    "$uses": ["JSONStructureValidation"],
    "type": "object", "name": "R",
    "additionalProperties": False,
    "properties": {
        "sid": {"type": "string", "pattern": "^s-[0-9]+$",
                "minLength": 3, "maxLength": 12},
        "w": {"type": "int32", "minimum": 1, "maximum": 10_000},
        "big": {"type": "int64", "minimum": "100"},
        "score": {"type": "double"},
        "flag": {"type": "boolean"},
        "cap": {"type": ["string", "null"]},
        "taken": {"type": "date"},
        "uid": {"type": "uuid"},
    },
    "required": ["sid", "w"],
}

_TOKENS = [
    '"s-12"', '"s-999999"', '"nope"', '"x"', '123', '-5', '0', '1.5',
    '1e4', '"150"', '"99"', '"abc"', 'true', 'false', 'null',
    '[1, 2]', '{"k": 1}', '"2024-01-01"', '"2024-13-99"', '20240101',
    '"6f1c3f1e-8d2a-4b3e-9c4d-aa00bb11cc22"', '"not-a-uuid"',
]


def _gen_docs(n: int, seed: int = 20260818) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    fields = list(SCHEMA["properties"])
    docs: list[tuple[str, str]] = []
    for i in range(n):
        k = f"r{i}"
        roll = rng.random()
        if roll < 0.04:
            docs.append((k, rng.choice(
                ["not json", "", "[1,2]", "5", '"str-root"', "null",
                 '{"sid": ']) ))
            continue
        members = []
        for name in fields:
            p = rng.random()
            if p < 0.30:
                continue  # absent (exercises required)
            members.append(f'"{name}": {rng.choice(_TOKENS)}')
        if rng.random() < 0.15:
            members.append(f'"extra{rng.randint(0, 2)}": 1')
        docs.append((k, "{" + ", ".join(members) + "}"))
    return docs


def test_json_auto_batch_matches_kernel(spark):
    from sdk_spark.operators.jsonbatch import validate_json_column
    from sdk_spark.plans.auto import validate_json_auto

    docs = _gen_docs(300)
    df = spark.createDataFrame(docs, "k string, doc string")
    viol, path = validate_json_auto(df, "doc", SCHEMA, ["k"])
    assert path == "catalyst"
    got = {(r["k"], r["constraint_id"], r["path"]) for r in viol.collect()}
    want = {(r["k"], r["constraint_id"], r["path"]) for r in
            validate_json_column(df, "doc", SCHEMA, key_cols=["k"]).collect()}
    missing = want - got
    fabricated = got - want
    detail = {k: d for k, d in docs
              if any(m[0] == k for m in (missing | fabricated))}
    assert not missing and not fabricated, (
        f"missing={sorted(missing)}\nfabricated={sorted(fabricated)}\n"
        f"docs={json.dumps(detail, indent=1)}")
