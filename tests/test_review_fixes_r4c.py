"""Round-4 third review sweep: compiler + table-check edge-case regressions.

Each test pins a confirmed defect from the high-effort review of
``compiler/core.py`` and ``operators/table_checks.py``:

* int128/uint128 bounds over decimal(38,0) columns built 39-digit literals
  that overflow decimal — ArithmeticException under ANSI, or NULL→false
  violations otherwise.  decimal(38,0) can never exceed int128's range.
* ``unique_violations`` rejoined duplicates with a non-null-safe join while
  ``duplicate_keys`` groups NULL keys — NULL-key duplicates silently
  vanished from the violation rows (the DuckDB window oracle counts them).
* ``psi_drift``'s equi full_outer split a NULL bucket present on both
  sides into two disjoint rows → spurious drift on identical data.
* non-scalar const/enum raised an opaque py4j SparkRuntimeException
  instead of SchemaCompileError, so ``validate_auto`` crashed instead of
  rerouting to the Arrow kernel (which handles deep equality).
* ``column_profile`` spliced raw column names into stack() SQL — names
  with spaces/quotes threw ParseException.
* ``fk_orphans`` reported NULL-fk rows as orphans, contradicting SQL
  MATCH SIMPLE semantics and the module's NULL-passes design rule (the
  DuckDB NOT IN oracle already excludes NULLs).
* string-backed decimal bounds lacked the malformed-input guard the
  int-backed path has → 'abc' double-reported format + every bound.
* top-level propertyNames/minProperties scope to schema-declared columns
  while the nested-struct path sees every field — adjudicated as an
  INTENTIONAL divergence (root DataFrames carry out-of-instance metadata
  columns: keys, partitions, case ids) and now documented + pinned.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _sch(t, extra=None, uses=None):
    node = {"type": t, **(extra or {})}
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R", "properties": {"v": node}}
    if uses:
        doc["$uses"] = uses
    return doc


def _violations(spark, doc, df):
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    return violation_rows(CompiledSchema(doc).validate(df), [])


def test_int128_bounds_over_decimal38_never_flag_or_crash(spark):
    df = spark.createDataFrame(
        [("99999999999999999999999999999999999999",),
         ("-99999999999999999999999999999999999999",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    assert _violations(spark, _sch("int128"), df).count() == 0


def test_uint128_over_decimal38_checks_only_the_negative_side(spark):
    df = spark.createDataFrame([("-5",), ("5",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    rows = _violations(spark, _sch("uint128"), df).collect()
    assert len(rows) == 1 and rows[0]["value"] == "-5"


def test_int64_over_decimal38_still_range_checked(spark):
    df = spark.createDataFrame([("9223372036854775808",), ("5",)], "v string") \
        .select(F.col("v").cast("decimal(38,0)").alias("v"))
    assert _violations(spark, _sch("int64"), df).count() == 1


def test_unique_violations_keeps_null_key_duplicates(spark):
    from sdk_spark.operators.table_checks import (duplicate_keys,
                                                  unique_violations)
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (1, "d"), (2, "e")],
        "k int, x string")
    groups = {r["k"]: r["cnt"] for r in duplicate_keys(df, ["k"]).collect()}
    assert groups == {None: 2, 1: 2}
    rows = unique_violations(df, ["k"]).collect()
    assert len(rows) == 4  # both members of both duplicate groups
    assert sum(1 for r in rows if r["k"] is None) == 2


def test_psi_drift_identical_snapshots_with_null_buckets_is_zero(spark):
    from sdk_spark.operators.table_checks import psi_drift
    df = spark.createDataFrame(
        [(float(x),) for x in (1, 2, 3)] + [(None,)] * 3, "x double")
    rows = psi_drift(df, df, F.floor(F.col("x"))).collect()
    assert len(rows) == 4  # buckets 1,2,3 and ONE merged NULL bucket
    assert abs(sum(r["psi_contrib"] for r in rows)) < 1e-12


def test_non_scalar_const_enum_raise_schema_compile_error(spark):
    from sdk_spark.compiler.core import CompiledSchema, SchemaCompileError
    base = {"$id": "https://x/s",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "type": "object", "name": "R"}
    obj = {"type": "object", "name": "V",
           "properties": {"a": {"type": "int32"}}}
    with pytest.raises(SchemaCompileError, match="non-scalar const"):
        CompiledSchema({**base, "properties": {"v": {**obj, "const": {"a": 1}}}}) \
            .validate(spark.createDataFrame([((1,),)], "v struct<a:int>"))
    with pytest.raises(SchemaCompileError, match="non-scalar enum"):
        CompiledSchema({**base,
                        "properties": {"v": {**obj, "enum": [{"a": 1}]}}}) \
            .validate(spark.createDataFrame([((1,),)], "v struct<a:int>"))


def test_validate_auto_reroutes_non_scalar_const_to_arrow(spark):
    from sdk_spark.plans.auto import validate_auto
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R",
           "properties": {"v": {"type": "object", "name": "V",
                                "properties": {"a": {"type": "int32"}},
                                "const": {"a": 1}},
                          "id": {"type": "string"}}}
    df = spark.createDataFrame([((1,), "k1"), ((2,), "k2")],
                               "v struct<a:int>, id string")
    viol, path = validate_auto(df, doc, ["id"])
    assert path == "arrow"
    rows = viol.collect()
    assert len(rows) == 1 and rows[0]["id"] == "k2"


def test_column_profile_handles_hostile_column_names(spark):
    from sdk_spark.operators.table_checks import column_profile
    df = spark.createDataFrame([(1, "x"), (2, None)], ["image size", "it's"])
    got = {r["column"]: r["nulls"] for r in column_profile(df).collect()}
    assert got == {"image size": 0, "it's": 1}


def test_fk_orphans_null_fk_is_not_an_orphan(spark):
    from sdk_spark.operators.table_checks import fk_orphans
    fact = spark.createDataFrame([(1,), (None,), (99,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    assert [r["fk"] for r in fk_orphans(fact, ["fk"], dim, ["pk"]).collect()] \
        == [99]


def test_malformed_decimal_string_reports_format_only(spark):
    doc = _sch("decimal", {"minimum": 1},
               uses=["JSONStructureValidation"])
    df = spark.createDataFrame([("abc",), ("0.5",), ("2.0",)], "v string")
    codes = sorted(r["constraint_id"]
                   for r in _violations(spark, doc, df).collect())
    assert codes == ["INSTANCE_DECIMAL_FORMAT_INVALID",
                     "INSTANCE_NUMBER_MINIMUM"]


def test_toplevel_scopes_to_declared_nested_checks_every_field(spark):
    """Documented root/nested divergence for propertyNames/maxProperties:
    at root, undeclared DataFrame columns are out-of-instance metadata
    (key/partition/case-id columns) and are NOT counted or name-checked;
    a nested struct is fully instance-typed, so every field is."""
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    base = {"$id": "https://x/s",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "$uses": ["JSONStructureValidation"]}
    inner = {"type": "object", "name": "V",
             "properties": {"good": {"type": "int32"}},
             "propertyNames": {"type": "string", "pattern": "^[a-z]+$"},
             "maxProperties": 1}
    flat = spark.createDataFrame([(1, 2)], ["good", "Bad Name"])
    top = violation_rows(
        CompiledSchema({**base, **inner, "name": "R"}).validate(flat), [])
    assert top.count() == 0  # metadata column neither counted nor name-checked
    nested_df = spark.createDataFrame([((1, 2),)],
                                      "v struct<good:int, `Bad Name`:int>")
    nested = violation_rows(
        CompiledSchema({**base, "type": "object", "name": "R",
                        "properties": {"v": inner}}).validate(nested_df), [])
    nested_codes = sorted(r["constraint_id"] for r in nested.collect())
    assert "INSTANCE_PROPERTY_NAME_INVALID" in nested_codes
    assert "INSTANCE_MAX_PROPERTIES" in nested_codes


# -- streaming/manifest review sweep (same session) ---------------------------


SCHEMA_V = {"$id": "https://x/m",
            "$schema": "https://json-structure.org/meta/extended/v0/#",
            "type": "object", "name": "R",
            "properties": {"id": {"type": "int64"},
                           "v": {"type": "int64", "maximum": 100}},
            "$uses": ["JSONStructureValidation"]}


def _fn(metrics_mode="observe"):
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    from sdk_spark.streaming.manifest import (observe_metrics,
                                              validate_partition_metrics)
    plan = CompiledSchema(SCHEMA_V, extended=True)

    def fn(pdf):
        validated = plan.validate(pdf)
        if metrics_mode == "observe":
            validated, metrics = observe_metrics(validated)
        else:
            metrics = validate_partition_metrics(validated)
        return violation_rows(validated, ["id"]), metrics
    return fn


def test_run_resumable_validates_null_partition(spark, tmp_path):
    """A NULL partition value must be selected (eqNullSafe), validated, and
    committed with its real row count — not matched-nothing and stamped
    committed with rows=0."""
    from sdk_spark.streaming.manifest import run_resumable
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 500), (3, None, 7)], "id long, p string, v long")
    run = run_resumable(spark, df, "p", str(tmp_path / "m"),
                        str(tmp_path / "v"), _fn(), schema_doc=SCHEMA_V)
    assert sorted(run.processed) == ["None", "a"]
    m = {r["partition_value"]: r for r in
         spark.read.parquet(str(tmp_path / "m")).collect()}
    assert m["None"]["rows"] == 2 and m["None"]["violation_count"] == 1
    viol = spark.read.parquet(str(tmp_path / "v"))
    assert viol.where(F.col("p").isNull()).count() == 1


def test_revalidation_clears_stale_violations(spark, tmp_path):
    """Schema change → re-validation of a committed partition; a clean
    result must OVERWRITE the partition's old violation rows (dynamic
    partition overwrite would leave them)."""
    from sdk_spark.streaming.manifest import run_resumable
    df = spark.createDataFrame([(1, "a", 500)], "id long, p string, v long")
    run_resumable(spark, df, "p", str(tmp_path / "m"), str(tmp_path / "v"),
                  _fn(), schema_doc=SCHEMA_V)
    viols = str(tmp_path / "v")
    assert spark.read.parquet(viols).count() == 1
    relaxed = {**SCHEMA_V,
               "properties": {"id": {"type": "int64"},
                              "v": {"type": "int64", "maximum": 10_000}}}
    run2 = run_resumable(spark, df, "p", str(tmp_path / "m"), viols,
                         _fn_for(relaxed), schema_doc=relaxed)
    assert run2.processed == ["a"]  # new fingerprint → re-validated
    assert spark.read.parquet(viols).count() == 0  # stale rows gone


def _fn_for(doc):
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    from sdk_spark.streaming.manifest import observe_metrics
    plan = CompiledSchema(doc, extended=True)

    def fn(pdf):
        validated, metrics = observe_metrics(plan.validate(pdf))
        return violation_rows(validated, ["id"]), metrics
    return fn


def test_resume_rescopes_on_input_path_change(spark, tmp_path):
    """The committed set is scoped by input path: pointing the same
    manifest at a different input re-validates overlapping partitions."""
    from sdk_spark.streaming.manifest import run_resumable
    df = spark.createDataFrame([(1, "a", 5)], "id long, p string, v long")
    run_resumable(spark, df, "p", str(tmp_path / "m"), str(tmp_path / "v"),
                  _fn(), schema_doc=SCHEMA_V, input_path="/data/jan")
    run2 = run_resumable(spark, df, "p", str(tmp_path / "m"),
                         str(tmp_path / "v"), _fn(), schema_doc=SCHEMA_V,
                         input_path="/data/feb")
    assert run2.processed == ["a"] and run2.skipped == []


def test_run_resumable_does_not_leak_session_conf(spark, tmp_path):
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    from sdk_spark.streaming.manifest import run_resumable
    df = spark.createDataFrame([(1, "a", 5)], "id long, p string, v long")
    run_resumable(spark, df, "p", str(tmp_path / "m"), str(tmp_path / "v"),
                  _fn(), schema_doc=SCHEMA_V)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == before


def test_committed_partitions_raises_on_corrupt_manifest(spark, tmp_path):
    """Only the missing-manifest first run means 'nothing committed';
    a corrupt manifest must surface, not trigger a silent full recompute."""
    import pytest as _pytest
    from sdk_spark.streaming.manifest import committed_partitions
    assert committed_partitions(spark, str(tmp_path / "absent")) == set()
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with _pytest.raises(Exception):
        got = committed_partitions(spark, str(bad))
        # a clean read of garbage must not quietly claim "first run"
        assert got != set()


def test_observe_metrics_matches_standalone_metrics(spark):
    from sdk_spark.compiler.core import CompiledSchema
    from sdk_spark.streaming.manifest import (observe_metrics,
                                              validate_partition_metrics)
    df = spark.createDataFrame([(1, 5), (2, 500), (3, 7)], "id long, v long")
    plan = CompiledSchema(SCHEMA_V, extended=True)
    expected = validate_partition_metrics(plan.validate(df))
    observed, thunk = observe_metrics(plan.validate(df))
    observed.write.format("noop").mode("overwrite").save()
    assert thunk() == {k: int(v) for k, v in expected.items()}


def test_streaming_violations_is_the_batch_shape(spark):
    """streaming_violations delegates to violation_rows: identical rows on
    the same (batch) input, no violation_count pre-filter plan bloat."""
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    from sdk_spark.streaming.validate_stream import streaming_violations
    df = spark.createDataFrame([(1, 5), (2, 500)], "id long, v long")
    got = sorted(map(tuple, streaming_violations(df, SCHEMA_V, ["id"]).collect()))
    want = sorted(map(tuple, violation_rows(
        CompiledSchema(SCHEMA_V, extended=True).validate(df), ["id"]).collect()))
    assert got == want and len(got) == 1


# -- multimodal / image-job / ingest review sweep (same session) ---------------


def test_image_job_reports_null_key_duplicates(spark):
    """The flagship pipeline's inline uniqueness back-join is null-safe:
    multiple NULL image_ids must surface as ENGINE_UNIQUE_VIOLATION rows."""
    from sdk_spark.plans.image_job import validate_images
    from sdk_spark.sources.images import generate_images
    base = generate_images(spark, 12, partitions=2, plant=False)
    nulled = base.withColumn(
        "image_id", F.when(F.col("image_id").isNotNull() &
                           (F.crc32(F.col("image_id")) % 3 == 0),
                           F.lit(None)).otherwise(F.col("image_id")))
    n_null = nulled.where(F.col("image_id").isNull()).count()
    assert n_null >= 2, "fixture must plant >=2 NULL keys"
    res = validate_images(nulled, persist_intermediate=False)
    uniq = res.violations.where(
        (F.col("constraint_id") == "ENGINE_UNIQUE_VIOLATION")
        & F.col("image_id").isNull())
    assert uniq.count() == n_null


def test_image_job_key_col_composes_with_media_checks(spark):
    from sdk_spark.plans.image_job import validate_images
    from sdk_spark.sources.images import generate_images
    df = generate_images(spark, 10, partitions=2, plant=False) \
        .withColumnRenamed("image_id", "img_key")
    res = validate_images(df, check_pixels=True, check_phash=True,
                          check_exif=True, key_col="img_key",
                          persist_intermediate=False)
    assert "img_key" in res.violations.columns
    res.violations.count()  # plans resolve end-to-end


def test_image_job_key_col_rejects_ambiguous_image_id(spark):
    from sdk_spark.plans.image_job import validate_images
    from sdk_spark.sources.images import generate_images
    df = generate_images(spark, 4, partitions=1, plant=False) \
        .withColumn("other", F.col("image_id"))
    df = df.withColumnRenamed("other", "k2")
    ambiguous = df  # has both image_id and k2
    with pytest.raises(ValueError, match="ambiguous"):
        validate_images(ambiguous, check_pixels=True, key_col="k2",
                        persist_intermediate=False)


def test_decode_image_fmt_crosscheck(spark):
    from sdk_spark.functions.png import encode_png
    from sdk_spark.operators.multimodal import decode_image
    import numpy as np
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    png = encode_png(arr)
    assert decode_image(png, fmt="png").shape == (4, 4, 3)
    with pytest.raises(ValueError, match="declared format"):
        decode_image(png, fmt="jpeg")


def test_phash_exact_for_lossless_tolerant_for_lossy(spark):
    """A stored hash 1 bit off must be flagged on PNG (lossless ⇒ exact)
    and absorbed on JPEG (lossy ⇒ tolerance)."""
    import numpy as np
    from sdk_spark.functions.jpeg import encode_jpeg
    from sdk_spark.functions.png import encode_png
    from sdk_spark.operators.multimodal import (decode_image,
                                                pixel_caption_invariants)
    from sdk_spark.sources.images import average_hash
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    png, jpg = encode_png(arr), encode_jpeg(arr, 95)
    rows = [("p", bytearray(png),
             average_hash(decode_image(png)) ^ 1),       # 1 bit off: flag
            ("j", bytearray(jpg),
             average_hash(decode_image(jpg)) ^ 1)]       # 1 bit off: absorb
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long")
    got = {r["image_id"] for r in pixel_caption_invariants(
        df, check_pixels=False, check_phash=True,
        phash_tolerance=6).collect()}
    assert got == {"p"}


def test_phash_only_mode_needs_no_caption_column(spark):
    import numpy as np
    from sdk_spark.functions.png import encode_png
    from sdk_spark.operators.multimodal import (decode_image,
                                                pixel_caption_invariants)
    from sdk_spark.sources.images import average_hash
    arr = np.full((8, 8, 3), 7, dtype=np.uint8)
    png = encode_png(arr)
    df = spark.createDataFrame(
        [("a", bytearray(png), average_hash(decode_image(png)))],
        "image_id string, bytes binary, phash long")  # NO caption column
    assert pixel_caption_invariants(df, check_pixels=False,
                                    check_phash=True).count() == 0


def test_ingest_error_contract(spark):
    from pyspark.sql import types as T
    from sdk_spark.sources.ingest import IngestError, coerce, instances_df
    with pytest.raises(IngestError, match="base64"):
        coerce("!!!!", T.BinaryType())
    with pytest.raises(IngestError, match="decimal"):
        coerce("abc", T.DecimalType(10, 2))
    st = T.StructType([T.StructField("a", T.IntegerType()),
                       T.StructField("b", T.StringType())])
    out = instances_df(spark, st, [None, {"a": 1, "b": "x"}],
                       scalar_root=False, case_ids=["null-root", "ok"])
    got = {r["case_id"]: (r["a"], r["b"]) for r in out.collect()}
    assert got == {"null-root": (None, None), "ok": (1, "x")}


# -- schema-layer review sweep (same session) ----------------------------------

import dataclasses as _dc


@_dc.dataclass
class _P6Inner:
    x: int


@_dc.dataclass
class _P6Rec:
    a: int | None          # optional, no default: NOT required
    b: int | str           # scalar union: compact type list
    c: str                 # required


@_dc.dataclass
class _P6Choice:
    v: int | _P6Inner


def test_extends_abstract_base_compiles_and_validates(spark):
    """Abstract bases exist to be extended: the Catalyst path must resolve
    them exactly like the row kernel and the reference (which never
    inspects the base's flag during the $extends merge)."""
    from sdk_spark.compiler.core import CompiledSchema, violation_rows
    from sdk_spark.rowcheck import RowChecker
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "definitions": {"Base": {"abstract": True, "name": "Base",
                                    "type": "object",
                                    "properties": {"a": {"type": "int32"}},
                                    "required": ["a"]}},
           "type": "object", "name": "R", "$extends": "#/definitions/Base",
           "properties": {"b": {"type": "string"}}}
    assert RowChecker(doc, extended=True).check({"a": 1, "b": "x"}) == []
    df = spark.createDataFrame([(1, "x"), (None, "y")], "a int, b string")
    rows = violation_rows(CompiledSchema(doc, extended=True).validate(df), ["b"])
    got = {(r["b"], r["constraint_id"]) for r in rows.collect()}
    assert got == {("y", "INSTANCE_REQUIRED_PROPERTY_MISSING")}


def test_export_pep604_unions():
    # NOTE: module-level dataclasses (_P6Rec/_P6Inner below) because this
    # file uses `from __future__ import annotations` — get_type_hints
    # cannot resolve function-local classes from stringified annotations
    from sdk_spark.schema.export import schema_from_dataclass

    doc = schema_from_dataclass(_P6Rec)
    props = doc["properties"]
    assert props["a"]["type"] == "int32"          # Optional unwraps
    assert props["b"]["type"] == ["int32", "string"]
    # a (optional) excluded; b and c (non-optional, no default) required
    assert sorted(doc["required"]) == ["b", "c"]


def test_export_union_with_dataclass_member_is_a_choice():
    from sdk_spark.schema.export import schema_from_dataclass
    from sdk_spark.schema.validator import check_schema

    doc = schema_from_dataclass(_P6Choice)
    node = doc["properties"]["v"]
    assert node["type"] == "choice"
    assert node["choices"]["_P6Inner"]["properties"]["x"]["type"] == "int32"
    assert check_schema(doc, extended=True) == []  # own checker accepts it


def test_infer_schema_on_empty_dataframe(spark):
    from sdk_spark.schema.infer import infer_schema
    df = spark.createDataFrame([], "a int, b string, c decimal(10,2)")
    doc = infer_schema(df)
    assert doc["properties"]["a"]["type"] == "int32"
    assert doc["properties"]["c"]["type"] == "decimal"


def test_infer_decimal_bounds_are_strings_and_self_accepting(spark):
    from decimal import Decimal

    from sdk_spark.schema.validator import check_schema
    from sdk_spark.schema.infer import infer_schema
    df = spark.createDataFrame([(Decimal("1.50"),), (Decimal("99.25"),)],
                               "d decimal(10,2)")
    doc = infer_schema(df)
    node = doc["properties"]["d"]
    assert isinstance(node["minimum"], str) and isinstance(node["maximum"], str)
    assert check_schema(doc, extended=True) == []


# -- LLM-tier operator review sweep (same session) ------------------------------


def test_minhash_rejects_indivisible_bands(spark, ):
    from sdk_spark.operators.dedup import minhash_lsh_candidates
    df = spark.createDataFrame([(1, "aaaa"), (2, "bbbb")], "doc_id long, text string")
    for engine in ("arrow", "sql"):
        with pytest.raises(ValueError, match="multiple of"):
            minhash_lsh_candidates(df, num_hashes=64, bands=12, engine=engine)
        with pytest.raises(ValueError, match="multiple of"):
            minhash_lsh_candidates(df, num_hashes=8, bands=16, engine=engine)


def test_simhash_ignores_null_text(spark):
    from sdk_spark.operators.dedup import simhash_candidates
    rows = [(i, None) for i in range(6)] + [(10, "some shared text here"),
                                            (11, "some shared text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in simhash_candidates(df).collect()}
    assert got == {(10, 11)}  # NULL-text docs form no bucket, no junk pairs


def test_split_bucket_handles_negative_keys(spark):
    """Hash-derived ids (xxhash64) are signed; negative keys must spread
    across bands, not silently dump into the first one."""
    from sdk_spark.operators.packing import hash_split, split_bucket
    df = spark.range(1, 3000).select((F.col("id") * -7919).alias("k"))
    buckets = df.select(split_bucket(F.col("k")).alias("b"))
    lo, hi, n = buckets.agg(F.min("b"), F.max("b"),
                            F.countDistinct("b")).first()
    assert lo >= 0 and hi <= 99 and n > 50
    split = hash_split(df, "k", {"train": 95, "valid": 5})
    frac = split.where(F.col("split") == "valid").count() / 2999
    assert 0.02 < frac < 0.09  # the valid band is populated, roughly 5%


def test_pack_stats_tokens_col(spark):
    from sdk_spark.operators.packing import pack_rows, pack_stats
    df = spark.createDataFrame([(i, "train", 100) for i in range(10)],
                               "doc_id long, split string, n_toks long")
    packed = pack_rows(df, id_col="doc_id", tokens_col="n_toks",
                       max_tokens=250, num_partitions=1)
    stats = pack_stats(packed, 250, tokens_col="n_toks").collect()
    assert sum(r["n_docs"] for r in stats) == 10
    assert all(r["total_tokens"] <= 250 for r in stats)


def test_exact_duplicates_caps_ids_but_keeps_exact_n(spark):
    from sdk_spark.operators.dedup import exact_duplicates
    df = spark.createDataFrame([(i, "same text") for i in range(50)],
                               "doc_id long, text string")
    g = exact_duplicates(df, max_ids_per_group=5).collect()
    assert len(g) == 1
    assert g[0]["n"] == 50                       # exact multiplicity
    assert g[0]["ids"] == [0, 1, 2, 3, 4]        # bounded, lowest-first
    full = exact_duplicates(df, max_ids_per_group=None).collect()
    assert full[0]["n"] == 50 and len(full[0]["ids"]) == 50


def test_curate_rejects_colliding_input_columns(spark):
    from sdk_spark.operators.curate import curate_corpus
    df = spark.createDataFrame([(1, "text", 0.5)],
                               "doc_id long, text string, punct_ratio double")
    with pytest.raises(ValueError, match="collide"):
        curate_corpus(df, report=False)


def test_shingles_expr_quotes_column_names(spark):
    from sdk_spark.operators.text import shingles_expr
    df = spark.createDataFrame([("hello world",)], ["body text"])
    row = df.select(shingles_expr("body text", 5).alias("s")).first()
    assert row["s"][0] == "hello"


# -- rowcheck kernel + auto-plan review sweep (same session) --------------------


def test_kernel_nan_decimal_bound_does_not_crash():
    from sdk_spark.rowcheck import RowChecker
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/validation/v0/#",
           "type": "decimal", "minimum": 0}
    out = RowChecker(doc).check("NaN")  # poison row must not kill the task
    assert any(f.code == "INSTANCE_NUMBER_MINIMUM" for f in out)


def test_kernel_extended_meta_uses_enables_conditionals():
    """Under the extended metaschema the reference auto-appends ALL addins
    to any node's $uses list, so $uses:['JSONStructureUnits'] + allOf must
    validate clean — the kernel falsely failed the conditional gate."""
    import sys
    sys.path.insert(0, "/root/reference/python/src")
    from json_structure.instance_validator import (
        JSONStructureInstanceValidator)
    from sdk_spark.rowcheck import RowChecker
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "$uses": ["JSONStructureUnits"],
           "type": "string", "allOf": [{"type": "string"}]}
    import copy
    ref = JSONStructureInstanceValidator(copy.deepcopy(doc),
                                         extended=True).validate("x")
    ours = RowChecker(copy.deepcopy(doc), extended=True).check("x")
    assert ref == [] and ours == []


def test_kernel_non_dict_composition_branch_is_a_finding():
    from sdk_spark.rowcheck import RowChecker
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/validation/v0/#",
           "$uses": ["JSONStructureValidation"],
           "type": "string", "allOf": ["bogus"]}
    out = RowChecker(doc).check("x")  # must not raise ValueError(dict('bogus'))
    assert isinstance(out, list)


def test_json_auto_key_col_collision_falls_back_to_arrow(spark):
    from sdk_spark.plans.auto import validate_json_auto
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"id": {"type": "string"},
                          "v": {"type": "int32"}}}
    df = spark.createDataFrame([("k1", '{"id": "k1", "v": 1}'),
                                ("k2", '{"id": "k2", "v": "bad"}')],
                               "id string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["id"])
    assert path == "arrow"  # no AMBIGUOUS_REFERENCE crash
    assert viol.where(F.col("id") == "k2").count() >= 1


def test_json_auto_flags_mistyped_optional_field(spark):
    """from_json nulls uncoercible fields; the catalyst path must still
    report the type mismatch the kernel reports."""
    from sdk_spark.operators.jsonbatch import validate_json_column
    from sdk_spark.plans.auto import validate_json_auto
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/core/v0/#",
           "type": "object", "name": "R",
           "properties": {"a": {"type": "int32"}}}
    df = spark.createDataFrame(
        [("r1", '{"a": "abc"}'),     # present, wrong type: must flag
         ("r2", '{"a": 3}'),         # fine
         ("r3", '{}'),               # absent: clean (not required)
         ("r4", '{"a": null}')],     # explicit null: kernel flags it too
        "k string, doc string")
    viol, path = validate_json_auto(df, "doc", doc, ["k"])
    assert path == "catalyst"
    got = {(r["k"], r["constraint_id"]) for r in viol.collect()}
    assert got == {("r1", "INSTANCE_TYPE_MISMATCH"),
                   ("r4", "INSTANCE_TYPE_MISMATCH")}
    kernel = {(r["k"], r["constraint_id"])
              for r in validate_json_column(df, "doc", doc,
                                            key_cols=["k"]).collect()}
    assert got == kernel


def test_instance_uses_empty_and_string_forms(spark):
    from sdk_spark.plans.auto import validate_json_with_instance_uses
    doc = {"$id": "https://x/s",
           "$schema": "https://json-structure.org/meta/extended/v0/#",
           "type": "object", "name": "R", "additionalProperties": False,
           "properties": {"a": {"type": "int32"}},
           "$offers": {"Extra": {"type": "object", "name": "X",
                                 "properties": {"extra": {"type": "int32"}}}}}
    empty = spark.createDataFrame([], "k string, doc string")
    viol, mode = validate_json_with_instance_uses(empty, "doc", doc, ["k"])
    assert viol.count() == 0  # no IndexError on zero branches
    # string-valued $uses enables the offered addin (kernel parity)
    df = spark.createDataFrame(
        [("r1", '{"$uses": "Extra", "a": 1, "extra": 2}')],
        "k string, doc string")
    viol, _ = validate_json_with_instance_uses(df, "doc", doc, ["k"],
                                               extended=True)
    assert viol.where(
        F.col("constraint_id") == "INSTANCE_ADDITIONAL_PROPERTY").count() == 0


# -- cli / media review sweep (same session) ------------------------------------


def test_audio_features_rate_zero_and_empty_degrade(spark):
    import struct
    from sdk_spark.operators.media import audio_features

    def wav(rate, n):
        data = b"\x00\x00" * n
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    df = spark.createDataFrame(
        [("zero_rate", bytearray(wav(0, 4))),
         ("empty", bytearray(wav(8000, 0))),
         ("ok", bytearray(wav(8000, 16)))],
        "media_id string, bytes binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got["zero_rate"]["decode_ok"] is False   # not ZeroDivisionError
    assert got["empty"]["rms"] == 0.0               # not NaN
    assert got["ok"]["decode_ok"] is True


def test_sample_frames_corrupt_payload_degrades(spark):
    from sdk_spark.functions.gif import encode_gif
    from sdk_spark.operators.media import sample_frames
    import numpy as np
    good = encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))
    rows = [("good", bytearray(good)),
            ("trunc", bytearray(good[:12])),        # truncated GIF
            ("junk", bytearray(b"GIF89a" + b"\xff" * 4))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"] for r in sample_frames(df, every_n=1).collect()}
    assert got == {"good"}  # corrupt rows yield zero frames, no task abort


def test_cli_unique_key_spans_partitions(spark, tmp_path):
    """--unique-key is TABLE-unique: a duplicate key split across two
    partitions must be reported even on the resumable per-partition path."""
    import json as _json
    import subprocess
    import sys

    from pyspark.sql import functions as F
    spark.range(0, 20).select(
        F.when(F.col("id") == 11, F.lit("dup"))
         .when(F.col("id") == 4, F.lit("dup"))
         .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("image_id"),
        (F.col("id") % 2).cast("string").alias("day"),
        (F.col("id") % 50).cast("int").alias("w")
    ).write.mode("overwrite").parquet(str(tmp_path / "in"))
    schema = {"$id": "https://x/s",
              "$schema": "https://json-structure.org/meta/extended/v0/#",
              "type": "object", "name": "R",
              "properties": {"image_id": {"type": "string"},
                             "day": {"type": "string"},
                             "w": {"type": "int32"}}}
    (tmp_path / "schema.json").write_text(_json.dumps(schema))
    import os
    r = subprocess.run(
        [sys.executable, "/root/repo/validate_job.py",
         "--schema", str(tmp_path / "schema.json"),
         "--input", str(tmp_path / "in"),
         "--violations", str(tmp_path / "viol"),
         "--manifest", str(tmp_path / "man"),
         "--partition-col", "day", "--unique-key", "image_id"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr[-500:]
    viol = spark.read.parquet(str(tmp_path / "viol"))
    dup_rows = viol.where(
        (F.col("constraint_id") == "ENGINE_UNIQUE_VIOLATION")
        & (F.col("image_id") == "dup"))
    # rows 4 (day=0) and 11 (day=1) — cross-partition, BOTH reported
    assert dup_rows.count() == 2
    # partition values read back type-inferred from the dir names
    assert {str(r["day"]) for r in dup_rows.collect()} == {"0", "1"}


def test_cli_no_extended_flag_parses():
    from sdk_spark.cli import build_arg_parser
    args = build_arg_parser().parse_args(["--schema", "s", "--no-extended"])
    assert args.extended is False
    args = build_arg_parser().parse_args(["--schema", "s"])
    assert args.extended is True
