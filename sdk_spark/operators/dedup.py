"""Deduplication operators for training-data pipelines (pure Catalyst).

Four tiers, all expressed as DataFrame ops so Catalyst owns the physical
strategy:

* **exact** — hash-groupBy on a normalized content fingerprint; the
  two-phase salted aggregation from ``table_checks`` keeps hot fingerprints
  (boilerplate docs) off a single reducer.
* **MinHash + LSH** — char-shingle → 64-perm minhash signature (computed in
  one projection with higher-order functions) → banded bucket join; only
  bucket-colliding pairs are candidates, so the quadratic step never touches
  the full table.  (Broder's resemblance sketch, the standard web-dedup
  pipeline shape.)
* **SimHash** — 64-bit sign-of-weighted-sum sketch; near-dup candidates are
  pairs sharing at least one of 4 16-bit chunks (Hamming <= 3 guarantee via
  pigeonhole), joined chunk-wise.
* **n-gram Jaccard** — exact verification on candidate pairs
  (array_intersect/array_union), used as the rescoring stage after LSH.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_exact, shingles_expr
from . import table_checks as tc


# -- exact ---------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fingerprint, ids, n)."""
    fp = df.select(F.col(id_col), fingerprint_exact(F.col(text_col)).alias("fp"))
    dup_fps = tc.duplicate_keys(fp, ["fp"])  # salted two-phase count
    return (fp.join(F.broadcast(dup_fps), "fp")
            .groupBy("fp")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"),
                 F.count(F.lit(1)).alias("n")))


def distinct_by_content(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Keep one row per content fingerprint (lowest id wins; deterministic)."""
    fp = df.withColumn("__fp", fingerprint_exact(F.col(text_col)))
    w = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return df.join(w, id_col, "left_semi")


# -- MinHash + LSH ----------------------------------------------------------------

def minhash_signature(text_col: str, num_hashes: int = 64,
                      shingle_k: int = 5) -> Column:
    """64-permutation minhash signature in ONE projection: for seed s,
    sig[s] = min over shingles of xxhash64(shingle, s)."""
    sh = shingles_expr(text_col, shingle_k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(F.transform(sh, lambda g: F.xxhash64(g, s))))


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Hash each band of the signature → array<struct<band, bucket>>."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice(sig, b * rows_per_band + 1, rows_per_band)
                       .cast("string")).alias("bucket")))


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash buckets."""
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_bands(minhash_signature(text_col, num_hashes, shingle_k),
                      bands, rows_per_band).alias("bnds"))
    exploded = sig.select("id", F.explode("bnds").alias("b")) \
                  .select("id", F.col("b.band").alias("band"),
                          F.col("b.bucket").alias("bucket"))
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (left.join(right, ["band", "bucket"])
             .where(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
             .distinct())
    return pairs


def ngram_jaccard(df: DataFrame, id_col: str, text_col: str,
                  pairs: DataFrame, shingle_k: int = 5) -> DataFrame:
    """Exact Jaccard over char shingle sets for candidate pairs."""
    sh = df.select(F.col(id_col).alias("__id"),
                   F.array_distinct(shingles_expr(text_col, shingle_k)).alias("__sh"))
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return joined.select(
        "id_a", "id_b",
        (inter / F.greatest(union, F.lit(1.0))).alias("jaccard"))


def near_duplicates_minhash(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", threshold: float = 0.7,
                            num_hashes: int = 64, bands: int = 16,
                            shingle_k: int = 5) -> DataFrame:
    """Full pipeline: LSH candidates → exact Jaccard rescoring → threshold."""
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands,
                                   shingle_k)
    scored = ngram_jaccard(df, id_col, text_col, cands, shingle_k)
    return scored.where(F.col("jaccard") >= threshold)


# -- SimHash ----------------------------------------------------------------------

def simhash(text_col: str, bits: int = 64) -> Column:
    """Charikar sign-sketch over whitespace tokens, packed into a long.

    Bit positions are compile-time constants, so the 64 per-bit votes unroll
    in Python into one (large) expression — still a single projection.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit(b: int) -> Column:
        vote = F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)))
        return F.when(vote >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")

    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = F.shiftleft(packed, 1) + bit(b)
    return packed


def simhash_chunks(sim: Column, chunks: int = 4, bits: int = 64) -> Column:
    """Split the simhash into equal bit chunks (pigeonhole LSH for
    Hamming distance <= chunks - 1)."""
    width = bits // chunks
    mask = (1 << width) - 1
    return F.array(*[
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftright(sim, i * width).bitwiseAND(F.lit(mask)).alias("val"))
        for i in range(chunks)])


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", chunks: int = 4) -> DataFrame:
    """Near-dup candidates: pairs sharing >= 1 simhash chunk."""
    s = df.select(F.col(id_col).alias("id"),
                  simhash(text_col).alias("sim"))
    ex = s.select("id", "sim", F.explode(simhash_chunks(F.col("sim"), chunks))
                  .alias("c")) \
          .select("id", "sim", F.col("c.chunk").alias("chunk"),
                  F.col("c.val").alias("val"))
    l, r = ex.alias("l"), ex.alias("r")
    pairs = (l.join(r, ["chunk", "val"])
             .where(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.col("l.sim").alias("sim_a"), F.col("r.sim").alias("sim_b"))
             .distinct())
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming"))
