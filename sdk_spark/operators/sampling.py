"""Deterministic sampling operators for corpus balancing.

* ``stratified_sample`` — exactly ``n`` rows per stratum (class-balanced
  eval sets, per-language caps).  Selection order is a SQL-replicable
  multiplicative hash of the id (same family as ``packing.split_bucket``)
  so the sample is stable under re-runs, repartitioning, and cluster
  sizes, and the driver can oracle it row-for-row in DuckDB.

  100-TB shape — TWO-PHASE hash-threshold selection, never a full-stratum
  sort: a naive ``row_number().over(partitionBy(stratum))`` ships *every
  row of a stratum to one task* (an "en" stratum at crawl scale is
  billions of rows on one executor).  Instead:

  1. per-stratum counts (partial-agg shuffle of #strata rows, then a
     size-gated broadcast back);
  2. a prefilter keeps only rows whose selection hash falls below
     ``~(oversample*n+slack)/count`` of the hash range — the exact top-n
     by hash is provably inside that set whenever it holds >= n rows,
     because the filter is a prefix of the selection order;
  3. the exact ``row_number`` ranks only the ~O(oversample*n) survivors
     per stratum — bounded work regardless of stratum size;
  4. a deterministic guard: any stratum whose survivor count fell below
     ``min(count, n)`` (astronomically rare at the default margin, but
     possible) is re-ranked over its full rows, so the result row set is
     *identical* to the naive form on every input.

* ``cap_per_key`` — the same machinery as a guard rail: at most ``n``
  rows per key (e.g. cap documents per domain before training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import _KEY_MOD, _KNUTH
from .table_checks import DEFAULT_BROADCAST_ROWS, gated_broadcast

#: hash range: selection order is uniform on [0, _P)
_P = 1_000_000_007


def _det_order(id_col: str):
    """Deterministic pseudo-random sort key, expressible in plain SQL.

    NULL ids map to -1 (below the [0, _P) hash range) so they rank
    first — the same position ASC NULLS FIRST gives them in the naive
    full-sort form — and survive the prefilter (a NULL comparison would
    silently drop them).  SQL twin: ``coalesce((id % M) * K % P, -1)``.

    Determinism contract: the selection is a total order only when ids
    are distinct, which an id column is by definition.  Several NULL-id
    rows in one stratum tie exactly on (-1, NULL); if the cutoff falls
    among them, which ones are picked is execution-dependent — in this
    form AND in the naive full sort (any engine tie-breaks row_number
    arbitrarily on equal keys).  Degenerate-key inputs need a real key
    first; they are not silently dropped, which was the r4 bug.
    """
    return F.when(F.col(id_col).isNull(), F.lit(-1)) \
        .otherwise(((F.col(id_col) % _KEY_MOD) * F.lit(_KNUTH)) % F.lit(_P))


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id", oversample: int = 4,
                      slack: int = 32) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, hash-order selected.

    Exact-deterministic (same row set as a full per-stratum sort) but
    scale-safe: the per-stratum sort only ever sees ~``oversample*n +
    slack`` hash-prefiltered survivors, not the whole stratum.
    """
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    target = oversample * n_per_stratum + slack
    ordc = _det_order(id_col)
    cols = df.columns

    # counts_plain is the un-hinted handle for the deficiency outer join
    # (a broadcast hint on the LEFT of a left join is unsupported and
    # logs warnings); gated_broadcast persists the same plan, so the
    # CacheManager serves both handles from one InMemoryRelation
    counts_plain = (df.groupBy(F.col(strata_col).alias("__strat"))
                    .agg(F.count(F.lit(1)).alias("__cnt")))
    counts = gated_broadcast(counts_plain, DEFAULT_BROADCAST_ROWS)
    same = F.col(strata_col).eqNullSafe(F.col("__strat"))
    j = df.join(counts, same, "inner")
    # keep-all for small strata; else floor(P*target/cnt)+1 so the
    # expected survivor count is >= target (numerator < 2^53: exact)
    thresh = (F.when(F.col("__cnt") <= F.lit(target), F.lit(_P))
              .otherwise((F.lit(float(_P * target)) /
                          F.col("__cnt")).cast("long") + 1))
    surv = j.where(ordc < thresh).drop("__strat", "__cnt")

    w = Window.partitionBy(strata_col).orderBy(ordc, F.col(id_col))
    picked = (surv.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= n_per_stratum))

    # guard: strata where the prefilter overshot (survivors < min(cnt, n))
    scnt = (surv.groupBy(F.col(strata_col).alias("__strat2"))
            .agg(F.count(F.lit(1)).alias("__scnt")))
    deficient = (counts_plain.join(
        scnt, F.col("__strat").eqNullSafe(F.col("__strat2")), "left")
        .where(F.coalesce(F.col("__scnt"), F.lit(0))
               < F.least(F.col("__cnt"), F.lit(n_per_stratum)))
        .select("__strat"))

    good = picked.join(F.broadcast(deficient), same, "left_anti") \
        .select(*cols)
    fb = df.join(F.broadcast(deficient), same, "leftsemi")
    fb = (fb.withColumn("__rk", F.row_number().over(w))
          .where(F.col("__rk") <= n_per_stratum).select(*cols))
    return good.unionByName(fb)


def cap_per_key(df: DataFrame, key_col: str, max_rows: int,
                id_col: str = "doc_id") -> DataFrame:
    """Alias of :func:`stratified_sample` under the guard-rail name."""
    return stratified_sample(df, key_col, max_rows, id_col)
