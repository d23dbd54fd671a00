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


import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint_exact, shingles_expr
from . import table_checks as tc

#: default LSH bucket-size cap. A bucket of B members yields B*(B-1)/2
#: candidate pairs; web-scale boilerplate (cookie banners, licence headers)
#: creates mega-buckets that go quadratic in one task. Members of oversized
#: buckets are dropped from the *near*-dup candidate set — byte-identical
#: boilerplate is exactly what ``exact_duplicates`` catches at linear cost,
#: so the standard pipeline (exact pass first, LSH on survivors) loses
#: nothing. Use ``oversized_buckets`` to report what was dropped.
DEFAULT_MAX_BUCKET = 1000

#: hash-salt fan-out for the exact-dedup partial top-n: a hot fingerprint's
#: final aggregation buffers hold ≤ group_size/_TOPN_SALTS ids each (spread
#: over reducers), and the merge level sees ≤ _TOPN_SALTS arrays per group.
_TOPN_SALTS = 1024


def _cap_buckets(exploded: DataFrame, bucket_cols: list[str],
                 max_bucket_size: int | None) -> DataFrame:
    """Drop members of LSH buckets larger than ``max_bucket_size``.

    One window count over the same (bucket) shuffle the self-join needs
    anyway — no extra shuffle stage, and the quadratic step is bounded to
    max_bucket_size²/2 pairs per bucket regardless of input skew.
    """
    if max_bucket_size is None:
        return exploded
    w = Window.partitionBy(*bucket_cols)
    return (exploded
            .withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= F.lit(max_bucket_size))
            .drop("__bsz"))


def _bucket_sizes(exploded: DataFrame, bucket_cols: list[str]) -> DataFrame:
    return exploded.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("members"))


def _bucket_pairs(exploded: DataFrame, bucket_cols: list[str],
                  payload_cols: list[str],
                  max_bucket_size: int | None) -> DataFrame:
    """In-bucket candidate pairs (a.id < b.id) via ONE exchange.

    Shape: window-cap → groupBy(bucket) collect_list → double Generate
    expansion.  Replaces the bucket self-join, which shuffled the bucket
    keys twice AND evaluated the upstream plan (the Arrow signature
    kernel) once per join side — PythonUDF subplans never canonicalize
    equal, so Catalyst's ReuseExchange cannot deduplicate them.  The
    window count and the aggregation share the same hash partitioning,
    so Catalyst plans a single exchange; the pre-filter bounds every
    collected array to ``max_bucket_size`` structs.  A 10M-member
    boilerplate bucket does pass through ONE task's WindowExec buffer
    before being dropped — that buffer is disk-spillable (bounded
    memory) and the alternative (a separate count aggregate +
    anti-join) would evaluate the Arrow signature kernel twice, which
    costs more than streaming the doomed rows once.  The Generates
    expand pairs inside whole-stage codegen.
    Returns columns ``a``/``b`` as structs of (id, *payload_cols).
    """
    ex = _cap_buckets(exploded, bucket_cols, max_bucket_size)
    item = F.struct(F.col("id"), *[F.col(c) for c in payload_cols])
    grouped = (ex.groupBy(*bucket_cols)
               .agg(F.collect_list(item).alias("xs"))
               .where(F.size("xs") >= 2))
    return (grouped
            .select(F.explode("xs").alias("a"), "xs")
            .select("a", F.explode("xs").alias("b"))
            .where(F.col("a.id") < F.col("b.id")))


# -- exact ---------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_threshold: int | None = 10_000_000,
                     max_ids_per_group: int | None = 10_000) -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fingerprint, ids, n).

    ``ids`` lists at most ``max_ids_per_group`` member ids (lowest first);
    ``n`` is always the exact group multiplicity.  Pass ``None`` to collect
    every id (unbounded arrays — only safe when no fingerprint is hot).

    The dup-fingerprint set is broadcast back onto the fact table only when
    a counted probe proves it fits (``table_checks.gated_broadcast``); a
    corpus that is mostly duplicates falls back to a shuffle join.
    """
    fp = df.select(F.col(id_col), fingerprint_exact(F.col(text_col)).alias("fp"))
    dup_fps = tc.duplicate_keys(fp, ["fp"])  # salted two-phase count
    joined = fp.join(tc.gated_broadcast(dup_fps, broadcast_threshold), "fp")
    # Bound the collected id arrays: one boilerplate page byte-identical
    # across 100M docs would otherwise materialize a 100M-element array in
    # a single aggregation buffer.  Two-level salted partial top-n (the
    # r4 global ``row_number().over(partitionBy(fp))`` streamed the whole
    # hot group through ONE task's WindowExec sort before dropping rows):
    # level 1 keeps the n lowest ids per (fp, hash-salt) — every final
    # aggregation buffer holds ≤ group_size/SALTS ids, spread across
    # reducers — and level 2 merges ≤ SALTS sorted arrays of ≤ n ids per
    # fingerprint.  ``n`` stays the EXACT multiplicity from the salted
    # count either way.  (One deliberate delta vs the r4 windowed form:
    # NULL ids no longer consume cap slots there before collect_list
    # dropped them — the cap now means "up to n listed ids", which is the
    # documented contract.)
    if max_ids_per_group is not None:
        n = int(max_ids_per_group)
        if n < 1:
            raise ValueError("max_ids_per_group must be >= 1 "
                             "(or None to collect every id)")
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(_TOPN_SALTS))
        partial = (joined
                   .groupBy("fp", salt.alias("__salt"))
                   .agg(F.slice(F.sort_array(F.collect_list(id_col)),
                                1, n).alias("__ids"),
                        F.max("cnt").alias("cnt")))
        return (partial.groupBy("fp")
                .agg(F.slice(F.sort_array(F.flatten(F.collect_list("__ids"))),
                             1, n).alias("ids"),
                     F.max("cnt").alias("n")))
    return (joined.groupBy("fp")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"),
                 F.max("cnt").alias("n")))


def distinct_by_content(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Keep one row per content fingerprint (lowest id wins; deterministic)."""
    fp = df.withColumn("__fp", fingerprint_exact(F.col(text_col)))
    w = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return df.join(w, id_col, "left_semi")


# -- MinHash + LSH ----------------------------------------------------------------

#: 2^31 - 1, a Mersenne prime. Affine permutations mod this keep every
#: intermediate below 2^62, so the arithmetic can never overflow a long
#: (Spark 4 runs ANSI mode by default — an overflow would abort the job).
_MINHASH_P = (1 << 31) - 1


def _perm_coeffs(num_hashes: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h -> (a*h + b) mod p, a != 0."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P))
            for _ in range(num_hashes)]


def minhash_signature(text_col: str, num_hashes: int = 64,
                      shingle_k: int = 5) -> Column:
    """num_hashes-permutation minhash signature in ONE array traversal.

    Each shingle is hashed exactly once (``xxhash64``); the per-permutation
    values are affine transforms ``(a_i * h + b_i) mod p`` of that single
    hash, folded into a running elementwise-min accumulator by ONE
    ``aggregate`` pass.  The naive form — ``transform(sequence(0,63),
    s -> array_min(transform(shingles, g -> xxhash64(g, s))))`` — re-derives
    the shingle array and re-hashes every shingle once per permutation on
    Spark's interpreted higher-order-function path (64 × |shingles| substring
    + hash evaluations per row; measured ~600 ms/row on 300-char docs, ~100×
    slower than this form).
    """
    sh = shingles_expr(text_col, shingle_k)
    hs = F.transform(sh, lambda g: F.pmod(F.xxhash64(g), F.lit(_MINHASH_P)))
    coeffs = _perm_coeffs(num_hashes)
    init = F.array_repeat(F.lit(_MINHASH_P).cast("long"), num_hashes)
    return F.aggregate(
        hs, init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MINHASH_P))
                      for a, b in coeffs]),
            lambda m, v: F.least(m, v)))


def minhash_signature_arrow(text_col: str, num_hashes: int = 64,
                            shingle_k: int = 5) -> Column:
    """Arrow-batched minhash signature: the 100-TB default engine.

    The pure-Catalyst form (``minhash_signature``) is a single array
    traversal, but higher-order-function lambdas run on Spark's
    *interpreted* expression path — measured ~20 ms/row at 128 perms on
    300-char docs (|shingles| × num_hashes interpreted evals/row).  This
    kernel does the same math as one numpy batch per Arrow chunk:
    per-window 64-bit polynomial hashes (sliding_window_view over the
    UTF-32 code points), then ``min((a_i·h + b_i) mod p)`` as a single
    (|shingles| × num_hashes) broadcasted matrix-min — ~0.1 ms/row, ~200×
    faster, with identical Broder recall guarantees (any uniform shingle
    hash works; candidate precision is restored by the exact-Jaccard
    rescore either way).
    """
    from pyspark.sql.functions import pandas_udf

    sig_of = _make_doc_signature(num_hashes, shingle_k)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        old = np.seterr(over="ignore")  # uint64 wraparound is the hash
        out = [None if t is None else sig_of(t) for t in texts]
        np.seterr(**old)
        return pd.Series(out)

    # guide §4.4: downstream filters referencing the signature column get
    # pushed below the parallelism repartition WITH A COPY of this kernel
    # (two ArrowEvalPython nodes, the whole signature cost paid twice);
    # the kernel is pure, but the non-deterministic mark forbids the
    # duplicating push
    return _sig.asNondeterministic()(F.col(text_col))


_FNV_BASIS = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _make_doc_signature(num_hashes: int, shingle_k: int):
    """Per-doc numpy minhash: text -> int64[num_hashes] (shared by the
    signature and band-bucket kernels)."""
    from numpy.lib.stride_tricks import sliding_window_view

    coeffs = _perm_coeffs(num_hashes)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)
    P = _MINHASH_P
    # per-position multipliers R^(k-1-j) under uint64 wraparound
    old = np.seterr(over="ignore")
    RPOW = np.empty(shingle_k, dtype=np.uint64)
    RPOW[-1] = np.uint64(1)
    for j in range(shingle_k - 2, -1, -1):
        RPOW[j] = RPOW[j + 1] * _FNV_PRIME
    np.seterr(**old)

    def sig_of(text: str) -> np.ndarray:
        cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        if len(cp) >= shingle_k:
            win = sliding_window_view(cp, shingle_k).astype(np.uint64)
            h = (win * RPOW).sum(axis=1, dtype=np.uint64) + _FNV_BASIS
        else:  # short doc: one shingle = the whole text (SQL parity)
            pad = np.zeros(shingle_k, dtype=np.uint64)
            pad[:len(cp)] = cp
            h = (pad * RPOW).sum(dtype=np.uint64) + _FNV_BASIS
            h = h.reshape(1)
        hm = (h % np.uint64(P)).astype(np.int64)
        vals = (hm[:, None] * A[None, :] + B[None, :]) % P
        return vals.min(axis=0)

    return sig_of


def minhash_band_buckets_arrow(text_col: str, num_hashes: int, bands: int,
                               shingle_k: int = 5) -> Column:
    """Arrow kernel emitting the banded bucket hashes directly:
    ``int64[bands]`` where position = band index.

    Folding the banding into the kernel removes the per-row interpreted
    ``transform``/``slice``/``xxhash64`` expression tree of
    ``minhash_bands`` (measured ~70 us/row at 16 bands — 2.5x the cost
    of the signature itself).  The bucket is an FNV fold of the band's
    signature values; any deterministic hash of the band tuple gives
    the same Broder collision guarantees.
    """
    from pyspark.sql.functions import pandas_udf

    rows_per_band = num_hashes // bands
    sig_of = _make_doc_signature(num_hashes, shingle_k)

    @pandas_udf("array<long>")
    def _bb(texts: pd.Series) -> pd.Series:
        old = np.seterr(over="ignore")
        out = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            v = sig_of(text).astype(np.uint64).reshape(bands,
                                                       rows_per_band)
            acc = np.full(bands, _FNV_BASIS, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = (acc ^ v[:, j]) * _FNV_PRIME
            out.append(acc.view(np.int64))
        np.seterr(**old)
        return pd.Series(out)

    # guide §4.4 (same as minhash_signature_arrow): block the optimizer
    # from duplicating the kernel below the parallelism repartition
    return _bb.asNondeterministic()(F.col(text_col))


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Hash each band of the signature → array<struct<band, bucket>>.

    ``transform`` over a single-element array is a *let binding*: the
    signature expression is evaluated once and the lambda variable carries
    the value into all band slices (referencing ``sig`` directly inside the
    band lambda would re-evaluate the whole signature once per band on the
    interpreted path).
    """
    def _bands(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.slice(s, b * rows_per_band + 1, rows_per_band)
                           .cast("string")).alias("bucket")))

    return F.get(F.transform(F.array(sig), _bands), 0)


def _minhash_exploded(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int, bands: int, shingle_k: int,
                      engine: str = "arrow") -> DataFrame:
    if bands <= 0 or num_hashes % bands != 0:
        # fail at PLAN time with the real reason: unvalidated, the arrow
        # kernel dies per-batch on an opaque numpy reshape error while the
        # sql engine silently ignores the remainder permutations (and with
        # bands > num_hashes hashes empty slices — every doc in one bucket)
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})")
    if engine == "arrow":
        bk = df.select(
            F.col(id_col).alias("id"),
            minhash_band_buckets_arrow(text_col, num_hashes, bands,
                                       shingle_k).alias("bk"))
        return bk.select("id", F.posexplode("bk").alias("band", "bucket"))
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_bands(minhash_signature(text_col, num_hashes, shingle_k),
                      bands, rows_per_band).alias("bnds"))
    return sig.select("id", F.explode("bnds").alias("b")) \
              .select("id", F.col("b.band").alias("band"),
                      F.col("b.bucket").alias("bucket"))


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
                           engine: str = "arrow") -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash buckets.

    Buckets larger than ``max_bucket_size`` are dropped before the
    self-join (see ``DEFAULT_MAX_BUCKET``); report them with
    ``minhash_oversized_buckets``.  ``engine='arrow'`` (default) computes
    signatures in the vectorized numpy kernel; ``'sql'`` keeps the
    pure-Catalyst expression (same recall math, ~200× slower per row).
    """
    pairs = _bucket_pairs(
        _minhash_exploded(df, id_col, text_col, num_hashes, bands, shingle_k,
                          engine),
        ["band", "bucket"], [], max_bucket_size)
    return (pairs.select(F.col("a.id").alias("id_a"),
                         F.col("b.id").alias("id_b"))
            .distinct())


def minhash_oversized_buckets(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text", num_hashes: int = 64,
                              bands: int = 16, shingle_k: int = 5,
                              max_bucket_size: int = DEFAULT_MAX_BUCKET,
                              engine: str = "arrow") -> DataFrame:
    """(band, bucket, members) for every bucket the cap excluded — the
    audit trail for what ``minhash_lsh_candidates`` skipped.  Pass the
    SAME ``engine`` as the candidates call: the two engines hash buckets
    differently, so an arrow audit does not describe an sql run."""
    sizes = _bucket_sizes(
        _minhash_exploded(df, id_col, text_col, num_hashes, bands, shingle_k,
                          engine),
        ["band", "bucket"])
    return sizes.where(F.col("members") > F.lit(max_bucket_size))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a few-partition input across the cluster's cores.

    The minhash/simhash kernels are CPU-bound per row; a small local table
    read from one parquet file arrives as ONE task and serializes the whole
    signature stage.  At 100-TB scale the file count already exceeds the
    core count and this is a no-op (the partition check is plan-only, no
    job runs)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_LEN_SALT = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound): scrambles
    the linear structure of the rolling polynomial hash so only true
    ~2^-64 birthday collisions can merge two distinct shingles."""
    z = z ^ (z >> np.uint64(30))
    z = z * _SM_C1
    z = z ^ (z >> np.uint64(27))
    z = z * _SM_C2
    return z ^ (z >> np.uint64(31))


def _window_hash_rows(texts: list, k: int) -> list:
    """Per row: sorted unique uint64 hashes of the row's distinct char
    k-gram shingles (whole-text shingle for sub-k rows, length-salted so
    different-width shingles never compare equal); None for NULL rows.

    One rolling-polynomial pass per ~200k-codepoint chunk of the
    concatenated rows (cache-resident under the 32-way local worker
    parallelism), then a cheap per-row uint64 ``np.unique``.
    """
    olderr = np.seterr(over="ignore")
    try:
        RPOW = np.empty(k, dtype=np.uint64)
        RPOW[-1] = np.uint64(1)
        for j in range(k - 2, -1, -1):
            RPOW[j] = RPOW[j + 1] * _FNV_PRIME
        out: list = [None] * len(texts)
        longs: list = []
        for i, t in enumerate(texts):
            if t is None:
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            if len(cp) >= k:
                longs.append((i, cp))
            else:
                m = len(cp)
                h = (cp.astype(np.uint64) * RPOW[k - m:]) \
                    .sum(dtype=np.uint64) if m else np.uint64(0)
                h = h + np.uint64(m) * _LEN_SALT
                out[i] = _mix64(np.array([h], dtype=np.uint64))
        pos = 0
        while pos < len(longs):
            end, tot = pos, 0
            while end < len(longs) and (tot == 0 or
                                        tot + len(longs[end][1]) <= 200_000):
                tot += len(longs[end][1])
                end += 1
            grp = longs[pos:end]
            cat = np.concatenate([c for _, c in grp]).astype(np.uint64)
            L = len(cat)
            h = np.zeros(L - k + 1, dtype=np.uint64)
            for j in range(k):
                h += cat[j:L - k + 1 + j] * RPOW[j]
            h += np.uint64(k) * _LEN_SALT
            h = _mix64(h)
            start = 0
            for i, c in grp:
                nw = len(c) - k + 1
                out[i] = np.unique(h[start:start + nw])
                start += len(c)
            pos = end
        return out
    finally:
        np.seterr(**olderr)


def ngram_jaccard(df: DataFrame, id_col: str, text_col: str,
                  pairs: DataFrame, shingle_k: int = 5,
                  engine: str = "arrow") -> DataFrame:
    """Exact Jaccard over char shingle sets for candidate pairs.

    ``engine='arrow'`` ships the raw text (300 B) instead of the shingle
    array (~2 KB serialized) through the candidate join and computes the
    set intersection in a vectorized batch — the interpreted
    ``array_intersect`` over two ~400-element arrays costs ~1 ms/pair and
    dominated the whole dedup pipeline.  ``'sql'`` keeps the pure-Catalyst
    expression; both produce identical Jaccard values (same shingle
    definition as ``shingles_expr``: char k-grams at every position,
    whole-text shingle for short docs, distinct)."""
    if engine != "arrow":
        sh = df.select(
            F.col(id_col).alias("__id"),
            F.array_distinct(shingles_expr(text_col, shingle_k)).alias("__sh"))
        a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
        b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
        joined = pairs.join(a, "id_a").join(b, "id_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        return joined.select(
            "id_a", "id_b",
            (inter / F.greatest(union, F.lit(1.0))).alias("jaccard"))

    from pyspark.sql.functions import pandas_udf

    k = shingle_k

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        # Distinct-shingle Jaccard with each side's shingle set
        # represented as a SORTED UNIQUE uint64 window-hash array:
        # hashing is one vectorized rolling-polynomial pass per row
        # chunk (splitmix64-finalized, length-salted so sub-k shingles
        # occupy their own domain), uniqueness is a uint64 sort, and the
        # intersection is a searchsorted merge of the smaller array into
        # the larger.  |A∩B| and |A∪B| equal the Python-set counts
        # unless two distinct shingles of one pair collide in 64 bits
        # (probability ~|sh|²/2⁶⁴ ≈ 1e-14 per pair; asserted collision-
        # free on the oracled corpora by tests/test_opt_r06.py).  The
        # prior form — per-pair Python sets / void-dtype unique — spent
        # ~275 µs/pair in the worker (generic-object compares, no
        # cross-pair vectorization) and dominated the whole pipeline.
        out = np.empty(len(ta), dtype=np.float64)
        sa_list = _window_hash_rows(list(ta), k)
        sb_list = _window_hash_rows(list(tb), k)
        for i in range(len(ta)):
            sa, sb = sa_list[i], sb_list[i]
            if sa is None or sb is None:
                # NULL shingles to set(): intersection 0 → ratio 0.0
                # whether or not the union is empty
                out[i] = 0.0
                continue
            if len(sa) > len(sb):
                sa, sb = sb, sa
            pos = np.searchsorted(sb, sa)
            pos[pos == len(sb)] = 0     # out-of-range probes can't match
            inter = int((sb[pos] == sa).sum())
            union = len(sa) + len(sb) - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    txt = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    a = txt.select(F.col("__id").alias("id_a"), F.col("__t").alias("t_a"))
    b = txt.select(F.col("__id").alias("id_b"), F.col("__t").alias("t_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    # guide §4.4: the caller's threshold filter references the jaccard
    # column, and the optimizer pushes a COPY of the kernel below that
    # filter — the whole rescore paid twice.  The kernel is pure; the
    # non-deterministic mark forbids the duplicating push.
    return joined.select("id_a", "id_b",
                         _jac.asNondeterministic()(
                             F.col("t_a"), F.col("t_b")).alias("jaccard"))


def near_duplicates_minhash(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", threshold: float = 0.7,
                            num_hashes: int = 64, bands: int = 16,
                            shingle_k: int = 5,
                            max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
                            engine: str = "arrow") -> DataFrame:
    """Full pipeline: LSH candidates → exact Jaccard rescoring → threshold."""
    df = _ensure_parallelism(df)
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands,
                                   shingle_k, max_bucket_size, engine)
    scored = ngram_jaccard(df, id_col, text_col, cands, shingle_k, engine)
    return scored.where(F.col("jaccard") >= threshold)


# -- SimHash ----------------------------------------------------------------------

def simhash(text_col: str, bits: int = 64, engine: str = "arrow") -> Column:
    """Charikar sign-sketch over whitespace tokens, packed into a long.

    ``engine='arrow'`` (default) is a hybrid: tokenization and the
    per-token ``xxhash64`` stay in the JVM (ONE interpreted expression
    per token), and the per-bit vote accumulation + packing — previously
    a ``zip_with`` merging a 64-element CASE array per token on Spark's
    interpreted higher-order-function path, ~64 interpreted evals per
    token and the whole cost of the simhash stage — runs as one
    vectorized numpy pass per Arrow batch over the int64 hash arrays.
    The sketch is BIT-IDENTICAL: votes are exact integer counts
    (``2·popcount_b − n``) of the same JVM-produced hashes, and the
    MSB-first packing reproduces the fold ordering (bit 0 of the hash →
    bit 63 of the sketch) in wraparound uint64 arithmetic.

    ``engine='sql'`` keeps the pure-Catalyst single-``aggregate`` form
    (JVM-only; used by the differential tests and available where Python
    workers are undesirable).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    if engine != "arrow":
        zero_votes = F.array_repeat(F.lit(0), bits)
        votes = F.aggregate(
            hashes, zero_votes,
            lambda acc, h: F.zip_with(
                acc,
                F.array(*[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                           F.lit(1)).otherwise(F.lit(-1))
                    for b in range(bits)]),
                lambda a, v: a + v))
        # pack MSB-first (bit 0 of the hash ends up most significant,
        # matching the original unrolled shiftleft loop ordering)
        return F.aggregate(
            votes, F.lit(0).cast("long"),
            lambda acc, v: F.shiftleft(acc, 1)
            + F.when(v >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"))

    if bits != 64:
        raise ValueError("engine='arrow' supports bits=64 only "
                         "(pass engine='sql' for other widths)")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _pack(hs: pd.Series) -> pd.Series:
        vals = [None if h is None else np.asarray(h, dtype=np.int64)
                for h in hs]
        present = [i for i, v in enumerate(vals) if v is not None]
        out = np.zeros(len(vals), dtype=object)
        out[:] = None
        if present:
            all_lens = np.array([len(vals[i]) for i in present])
            if (all_lens == 0).any():
                # empty hash arrays cannot arise from split() (it yields
                # [""] for empty text), but reduceat misreads zero-length
                # segments — take the exact scalar path for such a batch
                for i in present:
                    v = vals[i]
                    votes = 2 * ((v[:, None] >> np.arange(64)) & 1) \
                        .sum(axis=0) - len(v)
                    POW = (np.uint64(1)
                           << (63 - np.arange(64)).astype(np.uint64))
                    out[i] = int(((votes >= 0).astype(np.uint64) * POW)
                                 .sum(dtype=np.uint64).view(np.int64))
                return pd.Series(out)
            POW = (np.uint64(1) << (63 - np.arange(64)).astype(np.uint64))
            # sub-batch so the (tokens × 64) bit matrix stays ~2 MB: 32
            # concurrent local workers share memory bandwidth, and a
            # cache-resident working set is what keeps this kernel
            # scaling across them (measured on the minhash kernel: large
            # streamed temporaries collapse under 32-way parallelism)
            SUB_TOKENS = 32_768
            pos = 0
            while pos < len(present):
                end = pos
                tot = 0
                while end < len(present) and (tot == 0
                                              or tot + all_lens[end]
                                              <= SUB_TOKENS):
                    tot += all_lens[end]
                    end += 1
                grp = present[pos:end]
                lens = all_lens[pos:end]
                cat = np.concatenate([vals[i] for i in grp])
                # bit matrix: column b = bit b of each hash (little-
                # endian unpack of the raw int64 bytes)
                bits_m = np.unpackbits(
                    cat.view(np.uint8).reshape(len(cat), 8),
                    axis=1, bitorder="little")
                offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
                counts = np.add.reduceat(bits_m, offs, axis=0,
                                         dtype=np.int64)
                votes = 2 * counts - lens[:, None]
                sims = ((votes >= 0).astype(np.uint64) * POW) \
                    .sum(axis=1, dtype=np.uint64).view(np.int64)
                for d, i in enumerate(grp):
                    out[i] = int(sims[d])
                pos = end
        return pd.Series(out)

    return _pack(hashes)


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


def _simhash_exploded(df: DataFrame, id_col: str, text_col: str,
                      chunks: int) -> DataFrame:
    # NULL text -> NULL signature, and groupBy treats NULL vals as equal:
    # without this filter every NULL-text doc lands in ONE bucket and
    # emits junk pairs with NULL hamming (the arrow minhash path drops
    # NULL signatures via posexplode — keep the engines consistent)
    s = df.where(F.col(text_col).isNotNull())           .select(F.col(id_col).alias("id"), simhash(text_col).alias("sim"))
    return s.select("id", "sim",
                    F.explode(simhash_chunks(F.col("sim"), chunks)).alias("c")) \
            .select("id", "sim", F.col("c.chunk").alias("chunk"),
                    F.col("c.val").alias("val"))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", chunks: int = 4,
                       max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
                       ) -> DataFrame:
    """Near-dup candidates: pairs sharing >= 1 simhash chunk.

    Chunk buckets larger than ``max_bucket_size`` are dropped before the
    self-join (see ``DEFAULT_MAX_BUCKET``); report with
    ``simhash_oversized_buckets``.
    """
    raw = _bucket_pairs(_simhash_exploded(_ensure_parallelism(df),
                                          id_col, text_col, chunks),
                        ["chunk", "val"], ["sim"], max_bucket_size)
    pairs = (raw.select(F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"),
                        F.col("a.sim").alias("sim_a"),
                        F.col("b.sim").alias("sim_b"))
             .distinct())
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming"))


def simhash_oversized_buckets(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text", chunks: int = 4,
                              max_bucket_size: int = DEFAULT_MAX_BUCKET,
                              ) -> DataFrame:
    """(chunk, val, members) for every chunk bucket the cap excluded."""
    sizes = _bucket_sizes(
        _simhash_exploded(df, id_col, text_col, chunks).select("id", "chunk", "val"),
        ["chunk", "val"])
    return sizes.where(F.col("members") > F.lit(max_bucket_size))
