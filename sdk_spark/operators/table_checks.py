"""Table-level validation operators (engine-new; no reference analogue).

The reference validates one JSON document at a time; at 10^12-row scale the
interesting constraints are *cross-row*: key uniqueness, referential
integrity, column statistics, and distribution drift (north_rule).  The
closest reference concepts are the per-array ``set`` duplicate check
(reference: instance_validator.py:521-527) and ``enum`` membership
(reference: instance_validator.py:641-643); these operators generalize them
to whole tables with explicit shuffle/skew strategy:

* ``duplicate_keys`` — two-phase salted aggregation: a per-input-partition
  partial count (salt = ``spark_partition_id()``) followed by a final merge,
  so a pathologically hot key (30% of rows sharing one ``phash``) never
  concentrates raw rows on one reducer.
* ``fk_orphans`` — left-anti join, broadcast by default (dimension tables
  are small); sort-merge fallback for large dimensions.
* ``column_profile`` — one aggregation pass over all profiled columns:
  count / null-rate / min / max / HLL approx-distinct.
* ``quantile_sketch`` / ``drift`` — KLL-style ``percentile_approx`` sketches
  (partials merged tree-wise by Spark's agg) compared against a reference
  sketch for population-drift detection.
"""

from __future__ import annotations

from collections import deque
from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import errors as E

DEFAULT_QUANTILES = [0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99]

#: byte budget for a gated broadcast.  Spark's own auto-broadcast default is
#: 10 MB; an *explicit* hint on a derived set can safely go higher because
#: we probe the real cardinality first, but multi-GB broadcasts replicate to
#: every executor — 64 MB is the ceiling here regardless of row count.
DEFAULT_BROADCAST_BYTES = 64 << 20

#: default row-count gate (combined with the byte budget below; the
#: effective cap is the stricter of the two).
DEFAULT_BROADCAST_ROWS = 1_000_000

_FIXED_TYPE_BYTES = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "float": 4,
    "date": 4, "long": 8, "double": 8, "timestamp": 8, "timestamp_ntz": 8,
}
#: assumed width for variable-size fields (string/binary/array/struct/map)
#: when estimating broadcast size — deliberately pessimistic so the byte
#: budget errs toward NOT broadcasting.
_VAR_TYPE_BYTES = 48

# Persisted probe plans, bounded so callers that gate broadcasts inside a
# loop (resumable per-partition validation, repeated image jobs) can't
# accumulate cached blocks for the lifetime of the application.  The handle
# must stay persisted past the probe — the consuming join reuses it — so
# eviction is LRU-by-insertion; `release_probe_cache()` frees everything.
_PROBE_CACHE: deque[DataFrame] = deque()
_PROBE_CACHE_MAX = 8


def _remember_persisted(df: DataFrame) -> None:
    _PROBE_CACHE.append(df)
    while len(_PROBE_CACHE) > _PROBE_CACHE_MAX:
        _PROBE_CACHE.popleft().unpersist(False)


def release_probe_cache() -> None:
    """Unpersist every probe plan ``gated_broadcast`` is still holding."""
    while _PROBE_CACHE:
        _PROBE_CACHE.popleft().unpersist(False)


def estimated_row_bytes(schema) -> int:
    """Schema-based per-row width estimate (for the broadcast byte budget)."""
    total = 0
    for f in schema.fields:
        total += _FIXED_TYPE_BYTES.get(f.dataType.typeName(), _VAR_TYPE_BYTES)
    return max(total, 8)


def gated_broadcast(small: DataFrame, threshold: int | None,
                    max_bytes: int = DEFAULT_BROADCAST_BYTES) -> DataFrame:
    """Broadcast ``small`` only when a counted probe proves it fits.

    An unconditional ``F.broadcast`` on a derived set (duplicate keys, dup
    fingerprints) is a 100-TB killer: a table where 10% of keys repeat has a
    billions-row duplicate set, and forcing it onto the driver/executors
    OOMs the job.  The gate is SIZE-aware, not just row-count-aware: the
    effective row cap is ``min(threshold, max_bytes / estimated_row_bytes)``
    so a wide-key set trips the gate long before ``threshold`` rows.  The
    probe ``limit(cap+1).count()`` is cheap (it can stop early) and the plan
    is persisted first so the aggregation feeding it is computed once, not
    once for the probe and once for the join; persisted probe plans live in
    a bounded LRU (``release_probe_cache()`` frees them early).  Above the
    cap the plain plan is returned and Catalyst/AQE picks a shuffle join
    (or its own runtime broadcast if statistics allow).

    ``threshold=None`` disables broadcasting outright.
    """
    if threshold is None:
        return small
    cap = min(int(threshold), max(1, max_bytes // estimated_row_bytes(small.schema)))
    small = small.persist(StorageLevel.MEMORY_AND_DISK)
    _remember_persisted(small)
    if small.limit(cap + 1).count() <= cap:
        return F.broadcast(small)
    # Gate failed: the set is oversized — exactly the case where retaining
    # a (potentially multi-TB) cache through the consuming shuffle join and
    # beyond is harmful.  Drop it now; the probe only materialized cap+1
    # rows, so the single downstream pass recomputes nothing of substance.
    try:
        _PROBE_CACHE.remove(small)
    except ValueError:
        pass
    small.unpersist(False)
    return small


def resolve_unique_strategy(df: DataFrame, strategy: str) -> str:
    """Shared auto/aqe/probe resolution for uniqueness back-joins
    (``unique_violations`` and the image job): ``auto`` → ``aqe`` when the
    session has adaptive execution enabled, else ``probe``."""
    if strategy == "auto":
        adaptive = df.sparkSession.conf.get("spark.sql.adaptive.enabled",
                                            "true")
        return "aqe" if str(adaptive).lower() == "true" else "probe"
    if strategy not in ("aqe", "probe"):
        raise ValueError(f"unknown unique_strategy {strategy!r}")
    return strategy


def duplicate_keys(df: DataFrame, keys: list[str],
                   hash_prefilter: bool = False) -> DataFrame:
    """Keys appearing more than once, with their multiplicity.

    Plain ``groupBy(keys).count()`` IS the two-phase salted shape for a
    count: Spark's HashAggregate always partial-aggregates map-side
    (``partial_count`` in the plan, pinned), so a hot key ships one
    partial row per input partition — never its raw rows — and shuffle
    volume is bounded to #partitions × #distinct-keys-per-partition
    exactly as an explicit ``groupBy(keys, spark_partition_id())`` stage
    would bound it.  The engine used the explicit salt through r4; it
    duplicates what the engine already does and measured ~35% slower on
    8M unique keys (one extra full hash-agg pass + a wider shuffle key),
    so r5 removed it.  Explicit salting remains necessary only for
    aggregates WITHOUT map-side reduction (``collect_list`` — see
    ``dedup.exact_duplicates``'s partial top-n).

    ``hash_prefilter=True`` replaces the full-width key shuffle with an
    8-byte one — EXACT results, for the corpus shape a uniqueness
    constraint expects (keys mostly unique): shuffle ``xxhash64(keys)``
    to find hash-duplicate candidate rows (a superset of true duplicates;
    near-empty on a mostly-unique corpus), then group only the candidates
    by the real key.  On a 100-TB table with a 36-byte uuid key this cuts
    the dominant shuffle ~5× (8+8 bytes/row vs the full key).  Leave it
    off for heavily-duplicated corpora (content fingerprints): there the
    candidate set is the whole table and the prefilter is a pure extra
    pass.  NULL handling matches ``groupBy`` (all-NULL keys hash equal
    and group equal).
    """
    if hash_prefilter:
        h = F.xxhash64(*[F.col(k) for k in keys])
        keyed = df.select(*keys, h.alias("__kh"))
        cand_h = (keyed.groupBy("__kh")
                  .agg(F.count(F.lit(1)).alias("__hc"))
                  .where(F.col("__hc") > 1)
                  .select("__kh"))
        # AQE broadcasts the near-empty candidate-hash set at runtime; a
        # heavily-duplicated corpus degrades to the shuffled semi-join —
        # exactly the case where the full-key shuffle was needed anyway
        df = keyed.join(cand_h, "__kh", "left_semi").drop("__kh")
    return (df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1))


def unique_violations(df: DataFrame, keys: list[str],
                      broadcast_threshold: int | None = DEFAULT_BROADCAST_ROWS,
                      strategy: str = "auto") -> DataFrame:
    """Violation rows for every row whose key is duplicated.

    The duplicate-key set is usually tiny → broadcast it back onto the fact
    table (no second shuffle of the big side).  ``strategy`` picks who
    decides that:

    * ``"probe"`` — ``gated_broadcast``'s counted probe proves the set fits
      before hinting.  The probe is an eager extra job evaluating the whole
      dup aggregation once (a full scan+shuffle pass) before the real query
      runs — the right shape only when the plan is reused many times.
    * ``"aqe"`` — no probe: adaptive execution converts the back-join to
      broadcast at runtime from the dup aggregation's ACTUAL shuffle size,
      and leaves it a shuffle join when the corpus is heavily duplicated
      (the same OOM guard, decided from real sizes for free).
    * ``"auto"`` (default) — ``"aqe"`` when the session has adaptive
      execution enabled, else ``"probe"``.

    ``broadcast_threshold=None`` forces the shuffle path outright.  An
    EXPLICIT non-default threshold is a contract, not a hint: the caller
    stated a row cap (usually to bound driver/executor memory), so the
    counted probe runs and enforces it even when the session would
    otherwise resolve to ``"aqe"`` — AQE's own guard is the byte-based
    ``autoBroadcastJoinThreshold`` and would silently ignore the cap
    (r5 review finding).
    """
    strategy = resolve_unique_strategy(df, strategy)
    dups = duplicate_keys(df, keys)
    # Null-safe rejoin: duplicate_keys groups NULL keys (groupBy treats
    # NULLs as equal — the same semantics as a SQL window PARTITION BY), so
    # the back-join must match them too or NULL-key duplicates silently
    # vanish from the violation rows.
    right = dups.select(*[F.col(k).alias(f"__dk_{i}")
                          for i, k in enumerate(keys)], "cnt")
    if (strategy == "probe" or broadcast_threshold is None
            or broadcast_threshold != DEFAULT_BROADCAST_ROWS):
        right = gated_broadcast(right, broadcast_threshold)
    cond = reduce(lambda a, b: a & b,
                  [df[k].eqNullSafe(right[f"__dk_{i}"])
                   for i, k in enumerate(keys)])
    joined = df.join(right, cond, "inner")
    key_expr = F.concat_ws("|", *[df[k].cast("string") for k in keys])
    return joined.select(
        *[df[k] for k in keys],
        F.lit(E.ENGINE_UNIQUE_VIOLATION).alias("constraint_id"),
        F.lit("#/" + ",".join(keys)).alias("path"),
        key_expr.alias("value"),
        F.col("cnt").alias("multiplicity"),
    )


def fk_orphans(fact: DataFrame, fk_cols: list[str],
               dim: DataFrame, pk_cols: list[str],
               broadcast_dim: bool = True,
               broadcast_threshold: int = DEFAULT_BROADCAST_ROWS) -> DataFrame:
    """Rows in ``fact`` whose foreign key has no match in ``dim``.

    Broadcast left-anti by default — but gated, not forced: dimensions are
    *usually* small, and ``gated_broadcast`` proves it with a counted probe
    before hinting, so a surprise billion-key dimension falls back to a
    shuffled anti-join instead of OOMing executors.  ``broadcast_dim=False``
    skips the probe and lets Catalyst/AQE pick shuffled hash or sort-merge.
    """
    dim_keys = dim.select(*[F.col(c).alias(f"__pk_{i}")
                            for i, c in enumerate(pk_cols)]).distinct()
    if broadcast_dim:
        dim_keys = gated_broadcast(dim_keys, broadcast_threshold)
    # SQL FK semantics (MATCH SIMPLE): a row with any NULL foreign-key
    # column satisfies the constraint — NULL-ness is a required/not-null
    # check's job, and a left-anti join would otherwise report every
    # NULL-fk row as an orphan (NULL never equals anything).
    candidates = fact.where(reduce(lambda a, b: a & b,
                                   [fact[fk].isNotNull() for fk in fk_cols]))
    cond = reduce(lambda a, b: a & b,
                  [candidates[fk] == dim_keys[f"__pk_{i}"]
                   for i, fk in enumerate(fk_cols)])
    return candidates.join(dim_keys, cond, "left_anti")


def fk_violations(fact: DataFrame, fk_cols: list[str],
                  dim: DataFrame, pk_cols: list[str],
                  key_cols: list[str] | None = None,
                  broadcast_dim: bool = True) -> DataFrame:
    orphans = fk_orphans(fact, fk_cols, dim, pk_cols, broadcast_dim)
    key_cols = key_cols or fk_cols
    fk_expr = F.concat_ws("|", *[F.col(c).cast("string") for c in fk_cols])
    return orphans.select(
        *key_cols,
        F.lit(E.ENGINE_FK_ORPHAN).alias("constraint_id"),
        F.lit("#/" + ",".join(fk_cols)).alias("path"),
        fk_expr.alias("value"),
    )


def column_profile(df: DataFrame, cols: list[str] | None = None,
                   hll_rsd: float = 0.05) -> DataFrame:
    """Per-column stats in ONE aggregation pass: count, nulls, min, max,
    approx distinct (HyperLogLog++). Output: one row per column."""
    cols = cols or df.columns
    # Aggregate under positional internal names so arbitrary column names
    # (spaces, quotes, dots) never reach the stack() SQL as identifiers;
    # the real name appears only as an escaped string literal label.
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(df[c].isNull().cast("long")).alias(f"__c{i}__nulls"),
            F.min(df[c]).cast("string").alias(f"__c{i}__min"),
            F.max(df[c]).cast("string").alias(f"__c{i}__max"),
            F.approx_count_distinct(df[c], hll_rsd).alias(f"__c{i}__distinct"),
        ]
    wide = df.agg(*aggs)
    # unpivot driver-side schema (tiny: one row), keep it a DataFrame
    stack_expr = ", ".join(
        "'{}', __c{i}__nulls, __c{i}__min, __c{i}__max, __c{i}__distinct"
        .format(c.replace("'", "''"), i=i) for i, c in enumerate(cols))
    return wide.selectExpr(
        "__rows as rows",
        f"stack({len(cols)}, {stack_expr}) as (column, nulls, min, max, approx_distinct)"
    ).select("column", "rows", "nulls",
             (F.col("nulls") / F.col("rows")).alias("null_rate"),
             "min", "max", "approx_distinct")


def quantile_sketch(df: DataFrame, cols: list[str],
                    quantiles: list[float] | None = None,
                    accuracy: int = 10_000) -> dict[str, list[float]]:
    """Merged quantile sketch per column (KLL-style ``percentile_approx``;
    partials are combined by Spark's partial/final aggregation)."""
    quantiles = quantiles or DEFAULT_QUANTILES
    aggs = [F.percentile_approx(c, quantiles, accuracy).alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    return {c: list(row[c]) if row[c] is not None else [] for c in cols}


def drift(ref_sketch: dict[str, list[float]],
          cur_sketch: dict[str, list[float]],
          threshold: float = 0.1) -> list[dict]:
    """Compare two quantile sketches; drift score = max relative quantile
    displacement, normalized by the reference IQR-ish scale."""
    findings = []
    for col, ref_q in ref_sketch.items():
        cur_q = cur_sketch.get(col)
        if not ref_q or not cur_q or len(ref_q) != len(cur_q):
            continue
        scale = max(abs(ref_q[-1] - ref_q[0]), 1e-12)
        score = max(abs(a - b) for a, b in zip(ref_q, cur_q)) / scale
        findings.append({
            "column": col,
            "constraint_id": E.ENGINE_DRIFT_EXCEEDED,
            "drift_score": score,
            "exceeded": score > threshold,
            "threshold": threshold,
        })
    return findings


def psi_drift(df_a: DataFrame, df_b: DataFrame, bucket: Column,
              alias: str = "bucket", epsilon: float = 1e-6) -> DataFrame:
    """Population Stability Index between two snapshots, per bucket.

    The complement of the KLL-sketch drift check: PSI is the industry's
    fixed-binning drift score (sum of (p-q)·ln(p/q) over buckets), fully
    deterministic given a deterministic ``bucket`` expression — so unlike
    the sketch path it has an exact SQL twin and the driver can oracle
    it.  Each side is ONE aggregation (two-phase partial/final); the
    per-bucket join is over the tiny bucket dimension.

    Returns (bucket, n_a, n_b, p_a, p_b, psi_contrib); the total PSI is
    ``sum(psi_contrib)``.  ``epsilon`` floors empty-bucket proportions so
    a bucket present in only one snapshot contributes a large-but-finite
    score instead of ±inf (standard PSI practice).
    """
    a = df_a.select(bucket.alias(alias)).groupBy(alias) \
        .agg(F.count(F.lit(1)).alias("n_a"))
    b = df_b.select(bucket.alias(alias)).groupBy(alias) \
        .agg(F.count(F.lit(1)).alias("n_b"))
    tot_a = F.sum("n_a").over(Window.partitionBy())
    tot_b = F.sum("n_b").over(Window.partitionBy())
    # Null-safe bucket join: groupBy collects NULL-bucket rows (e.g. NULL
    # inputs to the bucket expression) into one group per side; a plain
    # equi full_outer would split that group into two disjoint rows and
    # manufacture a large spurious PSI contribution on identical data.
    j = (a.join(b, a[alias].eqNullSafe(b[alias]), "full_outer")
         .select(F.coalesce(a[alias], b[alias]).alias(alias), "n_a", "n_b")
         .fillna(0, ["n_a", "n_b"])
         .withColumn("p_a", F.greatest(F.col("n_a") / tot_a,
                                       F.lit(epsilon)))
         .withColumn("p_b", F.greatest(F.col("n_b") / tot_b,
                                       F.lit(epsilon))))
    contrib = (F.col("p_a") - F.col("p_b")) * \
        F.log(F.col("p_a") / F.col("p_b"))
    return j.withColumn("psi_contrib", contrib)
