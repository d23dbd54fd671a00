"""Physical-plan shape regressions: the properties that make 100-TB work.

These assert on `executedPlan` text, not timings — timing is the bench's
job; the *shape* (pushdown, pruning, codegen, broadcast, salting) is what
must survive refactors.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_constraint_scan_prunes_columns(spark):
    """A 2-property schema over lineitem must read ONLY those columns plus
    the violation keys — never the full 16-column row."""
    from sdk_spark.compiler.core import CompiledSchema, violation_rows

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    schema = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/p", "name": "P",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"l_quantity": {"type": "double", "minimum": 1}},
    }
    validated = CompiledSchema(schema, extended=True).validate(li)
    out = violation_rows(validated, ["l_orderkey"]) \
        .select("l_orderkey", "constraint_id")
    text = _plan(out)
    m = re.search(r"ReadSchema: struct<([^>]*)>", text)
    assert m, text
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_constraint_plan_is_wholestage_codegen(spark):
    """The compiled projection stays inside whole-stage codegen (no Python,
    no codegen fallback) for a plain-keyword schema."""
    from sdk_spark.compiler.core import CompiledSchema

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    schema = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/w", "name": "W",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {
            "l_quantity": {"type": "double", "minimum": 1, "maximum": 45},
            "l_returnflag": {"type": "string", "enum": ["A", "N", "R"]},
        },
    }
    validated = CompiledSchema(schema, extended=True).validate(li)
    text = _plan(validated.select("valid"))
    # one Project fused directly over the scan — no Python eval nodes, no
    # extra stages; codegen applies to this shape (explain("codegen") shows
    # the compiled stage once executed)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert text.count("Project") == 1 and "FileScan parquet" in text
    assert "Exchange" not in text


def test_python_dialect_pattern_is_arrow_not_rowpython(spark):
    """The regex fallback must be the Arrow-batched evaluator, never
    row-at-a-time BatchEvalPython."""
    from sdk_spark.compiler.core import CompiledSchema

    part = spark.read.parquet(f"{SF}/part.parquet")
    schema = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://t.local/rx", "name": "Rx",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"p_name": {"type": "string",
                                  "pattern": r"(?P<c>red) "}},
    }
    validated = CompiledSchema(schema, extended=True).validate(part)
    text = _plan(validated.select("valid"))
    assert "ArrowEvalPython" in text
    assert "BatchEvalPython" not in text


def test_unique_keys_aggregates_partials_before_shuffle(spark):
    """duplicate_keys must reduce map-side BEFORE the shuffle: Spark's own
    partial_count IS the two-phase shape (a hot key ships one partial row
    per input partition, never raw rows) — the r4 explicit partition-id
    salt duplicated it at ~35% extra cost and must stay gone."""
    from sdk_spark.operators.table_checks import duplicate_keys

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    text = _plan(duplicate_keys(li, ["l_orderkey", "l_linenumber"]))
    assert "partial_count" in text, text
    assert text.count("HashAggregate") == 2, text
    assert "SPARK_PARTITION_ID" not in text.upper()
    assert "_salt" not in text


def test_fk_orphans_broadcasts_dim(spark):
    from sdk_spark.operators.table_checks import fk_orphans

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    text = _plan(fk_orphans(orders, ["o_custkey"], customer, ["c_custkey"]))
    assert "BroadcastHashJoin" in text and "LeftAnti" in text


def test_exact_duplicates_cap_has_no_window_funnel(spark):
    """VERDICT r4 #4: the id-array cap is a two-level salted partial
    top-n — no row_number window, so a hot fingerprint never streams
    through a single task's WindowExec sort."""
    from sdk_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame([(i, f"t{i % 7}") for i in range(500)],
                               "doc_id long, text string")
    out = exact_duplicates(df, max_ids_per_group=3)
    text = _plan(out)
    assert "Window" not in text, text
    # level-1 grouping carries the hash salt (Catalyst renames the alias
    # to _groupingexpression; pin the expression itself)
    assert "pmod(xxhash64(doc_id" in text, text
    rows = out.collect()
    assert len(rows) == 7
    got = sorted((r["n"], tuple(r["ids"])) for r in rows)
    want = sorted((72 if r < 3 else 71, (r, r + 7, r + 14))
                  for r in range(7))
    assert got == want


def test_cosine_topk_is_take_ordered(spark):
    """orderBy().limit(k) must lower to TakeOrderedAndProject, not a full
    sort of the table."""
    from sdk_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    text = _plan(cosine_topk(emb, [1.0] + [0.0] * 63, k=10))
    assert "TakeOrderedAndProject" in text
    assert "Sort " not in text.replace("TakeOrderedAndProject", "")


def test_image_job_single_input_scan(spark):
    """The fused job reads the input once for all JVM work (violations +
    uniqueness + verdicts come from the persisted slim projection)."""
    from sdk_spark.plans.image_job import validate_images
    from sdk_spark.sources.images import generate_images

    df = generate_images(spark, 200, partitions=2)
    res = validate_images(df, check_pixels=False)
    viol_plan = _plan(res.violations)
    verd_plan = _plan(res.verdicts)
    # verdicts read ONLY the cached intermediate, never the source
    assert "InMemory" in verd_plan
    assert "mapInPandas" not in verd_plan.lower()
    # violations: constraint branch + uniqueness branch both come from cache
    assert viol_plan.count("InMemory") >= 2
    res.unpersist()


def test_ann_index_probe_is_partition_pruned(spark, tmp_path):
    """The materialized ANN index scans ONLY the query's IVF cell directory
    (PartitionFilters in the probe plan) and returns the same top-k as the
    in-memory cell probe."""
    import numpy as np

    from sdk_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        write_ann_index,
    )

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ann_index")
    write_ann_index(df, path, n_planes=6, dim=8, nbits=3)

    query = [1.0, 1.0] + [0.0] * 6
    probe = ivf_topk_indexed(spark, path, query, k=5, nbits=3)
    text = _plan(probe)
    assert re.search(r"PartitionFilters: \[.*ivf_cell.*\]", text), text
    got = [r["vec_id"] for r in probe.collect()]
    exact = [r["vec_id"] for r in ivf_topk(df, query, k=5, nbits=3).collect()]
    assert got == exact


def test_phash_hamming_lsh_single_pass_shape(spark):
    """phash near-dup: rep-collapse + banded buckets + pair expansion must
    plan as bounded hash exchanges on REDUCED data — never a cartesian or
    broadcast-nested-loop join, never a per-row Python stage."""
    from sdk_spark.operators.similarity import phash_near_duplicates

    df = spark.range(0, 1000).selectExpr(
        "cast(id as string) image_id", "cast(hash(id) as long) phash")
    text = _plan(phash_near_duplicates(df))
    assert "CartesianProduct" not in text, text
    assert "BroadcastNestedLoop" not in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert len(re.findall(r"Exchange hashpartitioning", text)) <= 3, text


def test_cc_star_round_is_two_exchanges(spark):
    """One large-star + small-star round: each star op is a groupBy(min) +
    join on the SAME key — at most 2 distinct shuffle origins per star
    (agg + join reuse the key partitioning), and zero Python nodes."""
    from sdk_spark.operators.cluster import _large_star, _small_star

    e = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    text = _plan(_small_star(_large_star(e)))
    assert "Python" not in text, text
    # the round must stay in JVM aggregates/joins; no cartesian, no BNLJ
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_pack_sequences_single_python_stage(spark):
    """Packing = partition sort + ONE Arrow kernel; no shuffle when the
    input partitioning is kept (num_partitions=None)."""
    from sdk_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(i, 10) for i in range(100)],
                               "doc_id long, n_tokens long")
    text = _plan(pack_sequences(df))
    assert text.count("MapInPandas") == 1, text
    assert "Exchange" not in text, text          # no shuffle introduced
    assert "Sort [id" in text or "Sort [" in text


def test_hash_split_is_pure_projection(spark):
    """The split column is one codegen projection — no Python, no shuffle."""
    from sdk_spark.operators.packing import hash_split

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = hash_split(df, "doc_id", {"train": 80, "valid": 10, "test": 10})
    text = _plan(out)
    assert "Python" not in text and "Exchange" not in text, text
    assert "*(1)" in text, text      # whole-stage-codegen span marker


def test_kmeans_partials_shape(spark):
    """One Lloyd's assignment pass: Arrow kernel -> posexplode -> ONE
    hash-aggregate pair (partial + final over one exchange)."""
    from pyspark.sql import types as T
    from sdk_spark.operators.similarity import _kmeans_assign_partials
    import numpy as np

    df = spark.createDataFrame([([1.0, 0.0],), ([0.0, 1.0],)],
                               "v array<double>")
    schema = T.StructType([
        T.StructField("cluster", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("sums", T.ArrayType(T.DoubleType()))])
    partials = df.mapInPandas(
        _kmeans_assign_partials(np.eye(2), "v"), schema)
    agg = (partials
           .select("cluster", "n", F.posexplode("sums").alias("pos", "val"))
           .groupBy("cluster", "pos")
           .agg(F.sum("val"), F.sum("n")))
    text = _plan(agg)
    assert text.count("MapInPandas") == 1
    assert text.count("Exchange") == 1, text     # one shuffle for the agg


def test_trained_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    """The trained-k-means materialized index scans ONLY the nprobe
    nearest cell directories (PartitionFilters on ivf_cell — no full-table
    quantizer re-evaluation) and agrees with the unindexed trained probe."""
    import numpy as np
    from sdk_spark.operators.similarity import (
        ivf_topk_trained,
        ivf_topk_trained_indexed,
        load_ann_centroids,
        train_ivf_centroids,
        write_ann_index,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C = train_ivf_centroids(df, k=4, iters=3, spherical=True)
    path = str(tmp_path / "ann_trained")
    write_ann_index(df, path, n_planes=6, dim=8, centroids=C,
                    spherical=True)

    query = [1.0, -1.0] + [0.0] * 6
    probe = ivf_topk_trained_indexed(spark, path, query, k=5, nprobe=2)
    text = _plan(probe)
    assert re.search(r"PartitionFilters: \[.*ivf_cell.*\]", text), text
    assert "Python" not in text, text
    got = [r["vec_id"] for r in probe.collect()]
    exact = [r["vec_id"] for r in
             ivf_topk_trained(df, query, C, k=5, nprobe=2,
                              spherical=True).collect()]
    assert got == exact
    # sidecar round-trips the trained quantizer
    C2, sph = load_ann_centroids(spark, path)
    assert sph and np.allclose(C2, C)


def test_trained_ivf_probe_prunes_to_isin(spark):
    """The trained-cell probe is a plain Filter over a literal isin — no
    join against a centroid table, no Python."""
    import numpy as np
    from sdk_spark.operators.similarity import ivf_topk_trained

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    C = np.eye(4, 64)
    out = ivf_topk_trained(emb, [1.0] + [0.0] * 63, C, k=5, nprobe=2,
                           engine="sql")
    text = _plan(out)
    assert "Python" not in text, text
    assert "TakeOrderedAndProject" in text
    assert "Join" not in text
    # default (arrow) engine: ONE Arrow stage, same result set
    arrow = ivf_topk_trained(emb, [1.0] + [0.0] * 63, C, k=5, nprobe=2)
    atext = _plan(arrow)
    assert atext.count("MapInPandas") == 1, atext
    assert [r["vec_id"] for r in arrow.collect()] \
        == [r["vec_id"] for r in out.collect()]
