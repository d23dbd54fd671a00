"""Training-batch assembly operators: sequence packing + dataset splits.

An LLM training pipeline ends by (a) splitting the corpus into
train/validation/test and (b) packing documents into fixed-token-budget
sequences.  Both must be deterministic — a re-run (or a different cluster
size) has to produce the same splits and the same packing, or resumed jobs
and eval sets silently drift.

* ``hash_split`` — multiplicative-hash bucketing into weighted splits.
  The hash is plain int64 arithmetic (Knuth 2654435761 on a reduced key),
  chosen over ``xxhash64`` deliberately: it is expressible identically in
  any SQL engine, so the split is auditable outside Spark.
* ``pack_sequences`` — next-fit packing in key order: walk documents in
  ascending id, open a new bin whenever the next document would overflow
  ``max_tokens``.  Packing is inherently sequential, so the scalable form
  is partition-local: each hash partition packs independently (one Arrow
  kernel pass, no shuffle beyond the partitioning) and bins are namespaced
  by partition id.  Cross-partition "waste" is at most one underfull bin
  per partition — negligible at 10^12 docs over a few thousand partitions.
  Oversized single documents get a bin of their own (flagged), matching
  the reference behavior of every packing implementation: truncation is a
  tokenizer decision, not a packer decision.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Knuth multiplicative constant (golden-ratio scaling for 2^32)
_KNUTH = 2654435761
#: keys are reduced mod this before multiplying so the product stays far
#: inside int64 under Spark's ANSI overflow checking
_KEY_MOD = 1_000_003


def split_bucket(key_col: F.Column) -> F.Column:
    """Deterministic bucket in [0, 100) from a NON-NEGATIVE integer key.

    Fibonacci/multiplicative hashing taken from the HIGH bits of the
    32-bit product: ``((key % p) * KNUTH mod 2^32) * 100 >> 32``.  Taking
    the product mod 100 directly would make the bucket depend only on
    ``key mod 100`` (``(r*K) % 100 == ((r%100)*(K%100)) % 100``), so ids
    with a stride sharing a factor with 100 — multiples of 10/100, common
    with scaled or snowflake-style ids — would collapse into <=10 buckets
    and silently empty some split bands.  The high-bits form mixes every
    bit of the reduced key; a stride-s key advances the 32-bit product by
    ``s*KNUTH mod 2^32``, which walks the full circle for any stride.

    SQL twin (DuckDB / ANSI, int64-exact):
    ``(((((key % 1000003) + 1000003) % 1000003) * 2654435761)
    % 4294967296) * 100 >> 32`` (the double-mod makes ``%`` behave as
    pmod for negative keys; for non-negative keys it is the identity).

    ``pmod`` (not ``%``): Spark's ``%`` keeps the dividend's sign, so a
    negative key — hash-derived ids like xxhash64 fingerprints are signed
    and ~50% negative — would bucket negative, and ``b < acc`` in
    ``hash_split`` would silently dump every such row into the FIRST
    band regardless of weights."""
    h = (F.pmod(key_col, F.lit(_KEY_MOD)) * F.lit(_KNUTH)) % F.lit(1 << 32)
    return F.shiftright(h * F.lit(100), 32)


def hash_split(df: DataFrame, key_col: str,
               weights: dict[str, int]) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/...) by deterministic hash.

    ``weights`` are integer percentages summing to 100; rows land in a
    split by which cumulative band their hash bucket falls in.  Stable
    under repartitioning, cluster size, and re-runs by construction.
    """
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    # NULL keys hash to a NULL bucket, which falls through every band and
    # left split=NULL — downstream equi-joins (curate's token join) then
    # silently dropped the row.  Pin them to bucket 0 → the FIRST declared
    # split, deterministically (same spirit as sampling's NULLs-first rule).
    b = F.coalesce(split_bucket(F.col(key_col)), F.lit(0))
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = b < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


PACK_SCHEMA_SUFFIX = [
    T.StructField("bin_id", T.LongType()),
    T.StructField("bin_fill", T.LongType()),
    T.StructField("oversize", T.BooleanType()),
]


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", max_tokens: int = 2048,
                   num_partitions: int | None = None) -> DataFrame:
    """Assign every document a packing ``bin_id`` (next-fit in id order).

    Returns (id, tokens, bin_id, bin_fill, oversize): ``bin_fill`` is the
    bin's running total after this document, ``oversize`` marks documents
    larger than ``max_tokens`` that got a dedicated bin.  Bins are
    ``partition_id * 2^40 + local_bin`` so ids are unique without any
    cross-partition coordination.  With ``num_partitions=1`` the packing
    is globally sequential (the oracle-checkable configuration); the
    default keeps the input partitioning for scale.
    """
    # same state machine as pack_rows (one kernel serves both — a fix to
    # the subtle bin numbering cannot diverge between the two forms);
    # this wrapper only fixes the slim (id, tok) projection and names
    slim = df.select(F.col(id_col).alias("id"),
                     F.col(tokens_col).cast("long").alias("tok"))
    return pack_rows(slim, id_col="id", tokens_col="tok",
                     max_tokens=max_tokens, num_partitions=num_partitions)


def pack_rows(df: DataFrame, id_col: str = "doc_id",
              tokens_col: str = "n_tokens", max_tokens: int = 2048,
              num_partitions: int | None = None,
              split_col: str | None = None) -> DataFrame:
    """Next-fit packing that CARRIES the full row through one kernel.

    ``pack_sequences`` packs ONE split per call, so a multi-split
    pipeline tail evaluates its upstream once per split plus once for
    the bin join-back.  This kernel handles every split in a single
    pass.  Two ways to use it:

    * slim (recommended): pass only (id, split, tokens) and join
      ``bin_id`` back — the upstream plan appears twice (pack + probe)
      instead of N_splits+1 times, and Arrow only ever serializes
      integer/short-string columns.  This is what ``curate_corpus``
      does.
    * full-row: pass everything and skip the join — collapses the
      upstream to ONE evaluation, but every column rides the Arrow
      round trip; measured SLOWER than the slim form on text-heavy rows
      (20.8 s vs 15.1 s at sf1.0), so reserve it for narrow rows.

    With ``split_col`` rows order by (split, id) within each partition
    and the bin state RESETS at every split boundary, so a bin never
    mixes splits without a per-split pass; the reset only opens a new
    bin number, never reuses one, so ``bin_id`` stays unique on its own.
    Same determinism contract as ``pack_sequences`` (fixed
    ``num_partitions`` → identical bins on any cluster size); bin
    NUMBERS differ from per-split ``pack_sequences`` calls, which use
    one counter per split instead of one per partition.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    for c in ("bin_id", "bin_fill", "oversize"):
        if c in df.columns:
            raise ValueError(f"input already has a '{c}' column")
    out = df
    if num_partitions is not None:
        out = out.repartition(num_partitions, id_col) if num_partitions > 1 \
            else out.coalesce(1)
    # tokens_col as the last sort key: ids are normally unique, but if a
    # caller packs rows with duplicate ids, Spark's sort gives equal keys
    # no stable order — the extra key makes ties identical rows, whose
    # order cannot change the packing, so the determinism contract holds
    order = ([split_col] if split_col else []) + [id_col, tokens_col]
    out = out.sortWithinPartitions(*order)
    schema = T.StructType(list(df.schema.fields) + PACK_SCHEMA_SUFFIX)
    _SENTINEL = object()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << 40
        bin_no, fill, cur_split = 0, 0, _SENTINEL
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[tokens_col].tolist()
            splits = pdf[split_col].tolist() if split_col else None
            bin_ids, fills, overs = [], [], []
            for i, tok in enumerate(toks):
                tok = int(tok) if tok is not None and not pd.isna(tok) \
                    else 0
                if tok < 0:
                    # a negative count is corrupt input (overflowed or
                    # mis-joined) — it would silently DRAIN bin fill and
                    # over-pack past max_tokens; fail closed like the
                    # codec layer does
                    raise ValueError(
                        f"negative token count {tok} in '{tokens_col}' — "
                        f"fix or filter upstream")
                if splits is not None and splits[i] != cur_split:
                    if cur_split is not _SENTINEL:
                        bin_no += 1
                    fill = 0
                    cur_split = splits[i]
                if tok > max_tokens:
                    bin_no += 1
                    bin_ids.append(base + bin_no)
                    fills.append(tok)
                    overs.append(True)
                    bin_no += 1
                    fill = 0
                    continue
                if fill + tok > max_tokens:
                    bin_no += 1
                    fill = 0
                fill += tok
                bin_ids.append(base + bin_no)
                fills.append(fill)
                overs.append(False)
            res = pdf.copy()
            res["bin_id"] = bin_ids
            res["bin_fill"] = fills
            res["oversize"] = overs
            yield res

    return out.mapInPandas(kernel, schema)


def pack_stats(packed: DataFrame, max_tokens: int,
               tokens_col: str = "tok") -> DataFrame:
    """(bin_id, n_docs, total_tokens, utilization) — packing audit.

    ``tokens_col`` names the token-count column: ``pack_sequences``
    aliases it to ``tok`` (the default), while ``pack_rows`` keeps the
    input column's own name — pass it through for that shape.

    ``utilization`` is truncated to 4 decimals via INT64 arithmetic
    (``tokens*10000 DIV budget``, then scaled back to double) so any SQL
    engine reproduces it bit-for-bit — ``round()`` on doubles is
    engine-specific at ties and breaks cross-engine audits."""
    return (packed.groupBy("bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(tokens_col).alias("total_tokens"))
            .withColumn("utilization",
                        F.expr(f"CAST(total_tokens * 10000 DIV "
                               f"{int(max_tokens)} AS DOUBLE) / 10000")))
