"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: dot product via
  ``zip_with`` + ``aggregate`` (JVM-side, no UDF), then a global top-k
  (``orderBy().limit(k)`` lowers to TakeOrderedAndProject — no full sort).
* ``lsh_bucket_topk`` — the scale path: random-hyperplane (sign) LSH
  signatures computed in one projection; the query probes only its own
  bucket (plus optional multi-probe neighbors), so the exact rescoring
  touches a small candidate set.  Hyperplanes are seeded/deterministic and
  shipped as literals (broadcast with the plan).
* ``cosine_near_duplicates`` — pairwise embedding near-dup detection via
  the same bucket join (dedup tier 5: embedding-cosine).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))).cast("double")


def _as_vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>")


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k by cosine similarity (baseline path)."""
    q = _as_vec_lit(query)
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("score"))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: bit i = sign(<v, plane_i>), packed into a long."""
    bits = []
    for row in planes:
        plane = _as_vec_lit(list(row))
        bits.append(F.when(dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0)))
    packed = F.lit(0).cast("long")
    for b in bits:
        packed = F.shiftleft(packed, 1) + b.cast("long")
    return packed


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding",
                    n_planes: int = 12, seed: int = 42,
                    dim: int | None = None) -> DataFrame:
    if dim is None:
        # No driver-side `.first()` sniff: on a 10^12-row table that is a
        # full job just to learn a constant the caller already knows.
        raise ValueError(
            "with_lsh_bucket requires dim= (the embedding dimensionality); "
            "array columns do not carry a length in the Spark schema and "
            "inferring it would run a driver job over the full table")
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn(
        "lsh_bucket",
        lsh_signature(F.col(vec_col).cast("array<double>"), planes))


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 12, seed: int = 42,
                    multiprobe: int = 1) -> DataFrame:
    """ANN top-k: probe the query's LSH bucket (+ Hamming-1 neighbors when
    ``multiprobe`` > 0), exact cosine rescoring inside the candidate set.

    At 10^12 scale the table is written bucketed/partitioned by
    ``lsh_bucket`` so the probe is a partition-pruned scan, not a shuffle.
    """
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)
    qsig = 0
    for row in planes:
        qsig = (qsig << 1) | (1 if float(np.dot(row, query)) >= 0 else 0)
    # probe all buckets within Hamming distance `multiprobe` of the query's
    # signature (standard multi-probe LSH: trades probes for recall without
    # re-hashing the table)
    probes = {qsig}
    frontier = {qsig}
    for _ in range(max(0, multiprobe)):
        frontier = {s ^ (1 << i) for s in frontier for i in range(n_planes)}
        probes |= frontier
    bucketed = with_lsh_bucket(df, vec_col, n_planes, seed, dim)
    cands = bucketed.where(F.col("lsh_bucket").isin(*[int(p) for p in probes]))
    return cosine_topk(cands, query, k, id_col, vec_col)


def ivf_bucket(vec_col: Column, nbits: int = 4) -> Column:
    """Deterministic coarse cell id: sign bits of the first ``nbits``
    components (quadrant partitioning — an IVF-lite quantizer that needs no
    trained centroids, so an exact SQL twin exists for differential
    testing). At 10^12 scale the table is written partitioned/bucketed by
    this id so a probe is a partition-pruned scan."""
    packed = F.lit(0).cast("long")
    for i in range(nbits):
        packed = F.shiftleft(packed, 1) + \
            F.when(vec_col[i] >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    return packed


def ivf_topk(df: DataFrame, query: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nbits: int = 4) -> DataFrame:
    """ANN top-k via the sign-quadrant coarse cell: probe only the query's
    cell, exact cosine rescoring inside it (candidate set ≈ n / 2^nbits).

    Complements ``lsh_bucket_topk``: the hyperplane-LSH path has better
    recall on clustered data; this path is fully deterministic and
    SQL-expressible, so the driver can oracle it against brute force
    restricted to the same cell."""
    qbucket = 0
    for i in range(nbits):
        qbucket = (qbucket << 1) | (1 if query[i] >= 0 else 0)
    cands = df.where(ivf_bucket(F.col(vec_col), nbits) == F.lit(qbucket))
    return cosine_topk(cands, query, k, id_col, vec_col)


def write_ann_index(df: DataFrame, path: str, vec_col: str = "embedding",
                    n_planes: int = 12, seed: int = 42,
                    dim: int | None = None, nbits: int = 4) -> None:
    """Materialize the ANN 'index': the table partitioned on disk by the
    IVF cell, with the hyperplane-LSH bucket as a stored column.

    At 10^12 rows this is what makes a probe cheap: the IVF partition
    column prunes the scan to ~1/2^nbits of the files (verified by
    PartitionFilters in the probe plan), and the stored LSH bucket narrows
    further without recomputing signatures."""
    out = (with_lsh_bucket(df, vec_col, n_planes, seed, dim)
           .withColumn("ivf_cell", ivf_bucket(F.col(vec_col), nbits)))
    out.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)


def ivf_topk_indexed(spark, path: str, query: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     nbits: int = 4) -> DataFrame:
    """Probe the materialized index: the ivf_cell equality predicate is a
    PARTITION filter — only the query's cell directory is scanned."""
    qbucket = 0
    for i in range(nbits):
        qbucket = (qbucket << 1) | (1 if query[i] >= 0 else 0)
    df = spark.read.parquet(path).where(F.col("ivf_cell") == F.lit(qbucket))
    return cosine_topk(df, query, k, id_col, vec_col)


def cosine_near_duplicates(df: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           n_planes: int = 12, seed: int = 42,
                           dim: int | None = None,
                           max_bucket_size: int | None = "default") -> DataFrame:
    """Embedding near-dup pairs: bucket join then exact cosine filter.

    ``max_bucket_size`` bounds the per-bucket quadratic step exactly like
    the minhash/simhash caps and — like them — DEFAULTS to
    ``dedup.DEFAULT_MAX_BUCKET`` so a caller who forgets the kwarg cannot
    reintroduce the O(n²) mega-bucket at scale.  Pass ``None`` explicitly to
    keep every bucket.  Report excluded buckets with
    ``oversized_cosine_buckets``.
    """
    from .dedup import _cap_buckets, DEFAULT_MAX_BUCKET

    if max_bucket_size == "default":
        max_bucket_size = DEFAULT_MAX_BUCKET

    from .dedup import _bucket_pairs

    b = with_lsh_bucket(df, vec_col, n_planes, seed, dim) \
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_bucket")
    raw = _bucket_pairs(b, ["lsh_bucket"], ["v"], max_bucket_size)
    pairs = raw.select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        cosine(F.col("a.v").cast("array<double>"),
               F.col("b.v").cast("array<double>")).alias("score"))
    return pairs.where(F.col("score") >= threshold)


def oversized_cosine_buckets(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding", n_planes: int = 12,
                             seed: int = 42, dim: int | None = None,
                             max_bucket_size: int = 1000) -> DataFrame:
    """(lsh_bucket, members) for buckets a cap would exclude — the audit
    companion of ``cosine_near_duplicates(max_bucket_size=...)``."""
    b = with_lsh_bucket(df, vec_col, n_planes, seed, dim)
    return (b.groupBy("lsh_bucket")
            .agg(F.count(F.lit(1)).alias("members"))
            .where(F.col("members") > F.lit(max_bucket_size)))


# -- perceptual-hash (int64 Hamming) near-duplicates ---------------------------


def phash_near_duplicates(df: DataFrame, phash_col: str = "phash",
                          id_col: str = "image_id", max_distance: int = 4,
                          bands: int = 8,
                          max_bucket_size: int | None = None) -> DataFrame:
    """Near-duplicate pairs by Hamming distance on a 64-bit perceptual
    hash (the ``phash`` column of the north-rule image table).

    100-TB shape, in order:

    1. **Collapse identical hashes first.**  Exact-duplicate content —
       including the planted hot key where 30% of rows share one phash —
       reduces to ONE representative per distinct hash (salted-safe
       groupBy), so bucket sizes downstream are bounded by content
       diversity, not row skew.
    2. **Banded Hamming LSH.**  The 64 bits split into ``bands``
       contiguous slices; two hashes within ``max_distance`` share at
       least one identical slice whenever ``max_distance < bands``
       (pigeonhole), so recall is exact by construction, not
       probabilistic.
    3. **Single-exchange in-bucket pair expansion** (same machinery as
       the minhash path), bucket-capped.
    4. **Exact rescore JVM-side**: ``bit_count(a XOR b) <= max_distance``
       — no Python in the hot path.

    Returns (phash_a, phash_b, id_a, id_b, members_a, members_b,
    hamming); ``members_*`` carries how many original rows each
    representative stands for.
    """
    if not 64 % bands == 0:
        raise ValueError("bands must divide 64")
    if max_distance >= bands:
        raise ValueError(
            f"recall guarantee needs max_distance < bands "
            f"({max_distance} >= {bands})")
    from .dedup import _bucket_pairs, DEFAULT_MAX_BUCKET

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET
    width = 64 // bands
    mask = (1 << width) - 1

    reps = (df.where(F.col(phash_col).isNotNull())
            .groupBy(F.col(phash_col).alias("id"))
            .agg(F.min(id_col).alias("rep_id"),
                 F.count(F.lit(1)).alias("members")))
    exploded = reps.select(
        "id", "rep_id", "members",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftrightunsigned(F.col("id"), b * width)
                     .bitwiseAND(F.lit(mask)).alias("bucket"))
            for b in range(bands)])).alias("bb")) \
        .select("id", "rep_id", "members",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    pairs = _bucket_pairs(exploded, ["band", "bucket"],
                          ["rep_id", "members"], max_bucket_size)
    ham = F.bit_count(F.col("a.id").bitwiseXOR(F.col("b.id")))
    return (pairs
            .select(F.col("a.id").alias("phash_a"),
                    F.col("b.id").alias("phash_b"),
                    F.col("a.rep_id").alias("id_a"),
                    F.col("b.rep_id").alias("id_b"),
                    F.col("a.members").alias("members_a"),
                    F.col("b.members").alias("members_b"),
                    ham.alias("hamming"))
            .where(F.col("hamming") <= F.lit(max_distance))
            .distinct())
