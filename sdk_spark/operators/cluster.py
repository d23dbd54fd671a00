"""Duplicate-cluster resolution: connected components over near-dup pairs.

The dedup tier (``dedup.py`` / ``similarity.py``) emits *pairs* — but a
training-data pipeline needs a *decision*: which rows form one duplicate
cluster, and which single representative survives.  Pairs are a graph;
the decision is its connected components.

100-TB shape
------------
Spark has no built-in connected components, and the naive min-label
propagation converges in O(diameter) rounds — fine for the near-clique
clusters produced by dedup, but with no bound for pathological chains.
This module implements the **alternating large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014), which converges in O(log² n) rounds on ANY graph
and, per round, is nothing but::

    groupBy(node).agg(min(neighbor))   →   join back on node

— an aggregation and a join on the same key, so each round is one
shuffle exchange that AQE can re-plan for skew.  No ``collect_list``:
a mega-hub (the 30%-hot-phash skew fixture) never materializes its
neighborhood as an in-memory array; its minimum flows through a
streaming partial aggregate and the emit side is a join.

Each round truncates lineage (iterative plans otherwise grow by two
shuffles per round and overwhelm the optimizer), and convergence is
detected by a (count, hash-sum) fingerprint of the edge set — one
lightweight action per round on the already-materialized snapshot.
Without a checkpoint dir the rounds use ``localCheckpoint(eager=True)``
(executor cached blocks, reclaimed by the ContextCleaner).  With
``sc.setCheckpointDir`` configured (the production setting) each round
writes the edge set as parquet under a per-run directory inside the
checkpoint dir and reads it back — same lineage truncation, survives
executor loss, and, unlike ``DataFrame.checkpoint()`` files (which
Spark never reclaims while the app lives unless
``spark.cleaner.referenceTracking.cleanCheckpoints`` is flipped), every
SUPERSEDED round's directory is deleted as soon as the next round is
durable, so a run leaks at most one edge-set snapshot.  The FINAL
round's files back the returned labels and stay until the caller is
done with them (drop the run directory after materializing).

Reference parity: the reference SDK validates instances one at a time
and has no cross-row graph operator (nothing to cite); this operator is
part of the engine-new training-data tier required by the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import table_checks as tc


def _hadoop_rm(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (works on the
    cluster filesystem — HDFS/S3A/local — wherever the checkpoint dir
    lives, not just the driver's local disk)."""
    from ..fs import hadoop_fs

    fs, p = hadoop_fs(spark, path)
    fs.delete(p, True)


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (sym.groupBy("u").agg(F.min("v").alias("mv"))
         .select("u", F.least("mv", F.col("u")).alias("m")))
    return (sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Direct every edge high→low, connect N⁻(u) ∪ {u} to its minimum."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    via_children = (d.join(m, "u")
                    .where(F.col("v") != F.col("m"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v")))
    via_center = m.select(F.col("u"), F.col("m").alias("v"))
    return via_children.union(via_center).distinct()


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_rounds: int = 50,
                         checkpoint: bool = True) -> DataFrame:
    """(id, cluster_id) for every node of the pair graph; ``cluster_id``
    is the minimum node id of its connected component.

    ``max_rounds`` is a safety valve far above the O(log² n) bound —
    hitting it raises rather than returning a partially-merged labeling.
    """
    e = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull()
                & (F.col("u") != F.col("v")))
         .distinct())

    # Iterative lineage must be truncated each round or the plan grows
    # unboundedly.  localCheckpoint keeps blocks on EXECUTORS — fast, but
    # one lost executor kills the job unrecoverably mid-iteration.  When
    # the session has a reliable checkpoint dir configured
    # (sc.setCheckpointDir on HDFS/S3 — the production setting), write
    # each round's edge set as parquet under a per-run directory and read
    # it back: same truncation, survives executor loss, and the previous
    # round's directory is deleted as soon as the new one is durable —
    # DataFrame.checkpoint() files would instead accumulate O(rounds)
    # snapshots for the application's lifetime (module docstring).
    import uuid

    spark = pairs.sparkSession
    ckpt_base = spark.sparkContext.getCheckpointDir()
    run_dir = (f"{ckpt_base.rstrip('/')}/sdk_spark_cc_{uuid.uuid4().hex}"
               if ckpt_base is not None else None)
    state = {"last": None, "round": 0}

    def _truncate(df: DataFrame) -> DataFrame:
        if run_dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{run_dir}/round_{state['round']}"
        state["round"] += 1
        df.write.parquet(path)
        out = spark.read.parquet(path)
        if state["last"] is not None:
            _hadoop_rm(spark, state["last"])
        state["last"] = path
        return out

    if checkpoint:
        e = _truncate(e)
    prev = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e))
        if checkpoint:
            e = _truncate(e)
        fp = e.agg(F.count(F.lit(1)).alias("n"),
                   F.bit_xor(F.xxhash64("u", "v")).alias("h")).first()
        cur = (fp["n"], fp["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    # Fixpoint is a star forest: every child points at its component
    # minimum; roots appear only on the v side.
    children = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("id"),
                     F.col("v").alias("cluster_id")).distinct()
    return children.union(roots).distinct()


def dup_clusters(pairs: DataFrame, src: str = "id_a",
                 dst: str = "id_b") -> DataFrame:
    """Alias of :func:`connected_components` under the dedup-tier name."""
    return connected_components(pairs, src=src, dst=dst)


def resolve_duplicates(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id", src: str = "id_a",
                       dst: str = "id_b",
                       broadcast_threshold: int | None = 10_000_000) -> DataFrame:
    """Drop every clustered row except its cluster minimum (the keeper).

    The loser set (clustered nodes that are not their component minimum)
    is at most the number of near-dup rows — usually a small fraction of
    the corpus — so it rides the size-gated broadcast anti-join from
    ``table_checks``; a corpus that is mostly duplicates degrades to a
    shuffle anti-join instead of a multi-GB broadcast.  (``None`` would
    DISABLE the gated broadcast outright — the default opts in, like every
    other gated-broadcast consumer in the package.)
    """
    cc = connected_components(pairs, src=src, dst=dst)
    losers = (cc.where(F.col("id") != F.col("cluster_id"))
              .select(F.col("id").alias(id_col)))
    return df.join(tc.gated_broadcast(losers, broadcast_threshold),
                   id_col, "left_anti")
