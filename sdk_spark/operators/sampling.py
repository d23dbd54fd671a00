"""Deterministic sampling operators for corpus balancing.

* ``stratified_sample`` — exactly ``n`` rows per stratum (class-balanced
  eval sets, per-language caps).  Selection order is a SQL-replicable
  multiplicative hash of the id (same family as ``packing.split_bucket``)
  so the sample is stable under re-runs, repartitioning, and cluster
  sizes, and the driver can oracle it row-for-row in DuckDB.  One window
  over (stratum) — a single exchange; the rank is streaming-evaluable.
* ``cap_per_key`` — the same machinery as a guard rail: at most ``n``
  rows per key (e.g. cap documents per domain before training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import _KEY_MOD, _KNUTH


def _det_order(id_col: str):
    """Deterministic pseudo-random sort key, expressible in plain SQL."""
    return ((F.col(id_col) % _KEY_MOD) * F.lit(_KNUTH)) % F.lit(1_000_000_007)


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id") -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, hash-order selected."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    w = Window.partitionBy(strata_col).orderBy(_det_order(id_col),
                                              F.col(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n_per_stratum)
            .drop("__rk"))


def cap_per_key(df: DataFrame, key_col: str, max_rows: int,
                id_col: str = "doc_id") -> DataFrame:
    """Alias of :func:`stratified_sample` under the guard-rail name."""
    return stratified_sample(df, key_col, max_rows, id_col)
