"""Property tests: packing vs reference walk, inference self-acceptance."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sdk_spark.compiler.core import CompiledSchema
from sdk_spark.operators.packing import pack_sequences
from sdk_spark.schema.infer import infer_schema
from tests.test_packing import reference_next_fit


def test_pack_random_workloads_match_reference(spark):
    """Seeded random workloads — ties, zeros, oversize docs, null tokens —
    all match the sequential reference walk exactly (num_partitions=1)."""
    rng = random.Random(2026)
    for trial in range(8):
        cap = rng.choice([64, 1000, 2048])
        n = rng.randint(1, 120)
        docs = []
        for i in range(n):
            r = rng.random()
            if r < 0.05:
                tok = None                      # -> treated as 0
            elif r < 0.15:
                tok = rng.randint(cap + 1, cap * 3)   # oversize
            elif r < 0.25:
                tok = cap                      # exact-fit boundary
            else:
                tok = rng.randint(0, cap)
            docs.append((i, tok))
        df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
        got = {r["id"]: (r["bin_id"], r["bin_fill"], r["oversize"])
               for r in pack_sequences(df, max_tokens=cap,
                                       num_partitions=1).collect()}
        want = reference_next_fit(
            [(i, t if t is not None else 0) for i, t in docs], cap)
        assert got == want, f"trial {trial} cap {cap}"


def test_pack_parallel_ids_partition_invariant(spark):
    """For a FIXED num_partitions, bin assignment ignores the input's
    physical layout entirely (hash-by-id repartition)."""
    docs = [(i, 1 + (i * 197) % 900) for i in range(400)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    a = {r["id"]: r["bin_id"] for r in
         pack_sequences(df, max_tokens=1024, num_partitions=8).collect()}
    b = {r["id"]: r["bin_id"] for r in
         pack_sequences(df.repartition(3).sortWithinPartitions("n_tokens"),
                        max_tokens=1024, num_partitions=8).collect()}
    assert a == b


def test_infer_random_frames_accept_their_own_data(spark):
    """Any numeric/string frame: the inferred schema must validate its
    own source with zero violations (the module's core contract)."""
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(20, 80)
        rows = []
        for i in range(n):
            rows.append((
                i,
                rng.uniform(-1e6, 1e6) if rng.random() > 0.1 else None,
                rng.choice(["aa", "bb", "cc", "dd"]),
                "".join(rng.choice("abcdefg h") for _ in
                        range(rng.randint(1, 30))),
            ))
        df = spark.createDataFrame(
            rows, "id long, x double, cat string, txt string")
        doc = infer_schema(df)
        validated = CompiledSchema(doc, extended=True).validate(df)
        bad = validated.where(~F.col("valid"))
        assert bad.count() == 0, (trial, bad.first())
