"""Phase-isolated measurements for the optimization rounds (guide §1).

``bench.py`` is FROZEN for driver measurement; this harness reuses its
session/config/scaled-data machinery but times *phases inside* the
expensive queries with the noop sink, so the optimization work targets
the right stage.  Also dumps ``.explain("formatted")`` per phase when
``BENCH_EXTRA_PLANS`` points at a directory.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [phase ...]

Phases default to all.  Prints one JSON line per phase:
  {"phase": ..., "sec": [runs...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import bench  # noqa: E402  (frozen harness: session + scaled tables)


def _phases():
    from pyspark.sql import functions as F

    from sdk_spark.operators import dedup as D
    from sdk_spark.operators import similarity as S

    def docs(spark, d):
        return spark.read.parquet(f"{d}/documents.parquet")

    def emb(spark, d):
        return spark.read.parquet(f"{d}/embeddings.parquet")

    # --- minhash_dedup decomposition (bench operating point 128x16 @ 0.7)
    def mh_signature(spark, d):
        return D._minhash_exploded(D._ensure_parallelism(docs(spark, d)),
                                   "doc_id", "text", 128, 16, 5, "arrow")

    def mh_candidates(spark, d):
        return D.minhash_lsh_candidates(D._ensure_parallelism(docs(spark, d)),
                                        "doc_id", "text", 128, 16, 5,
                                        D.DEFAULT_MAX_BUCKET, "arrow")

    def mh_full(spark, d):
        return D.near_duplicates_minhash(docs(spark, d), threshold=0.7,
                                         num_hashes=128, bands=16)

    # --- simhash decomposition
    def sh_signature(spark, d):
        u = _simhash_union(spark, d)
        return u.where(F.col("text").isNotNull()).select(
            F.col("doc_id").alias("id"), D.simhash("text").alias("sim"))

    def sh_full(spark, d):
        import __spark_entry__ as e
        return e.q_simhash_near_dups(spark, d)

    def _simhash_union(spark, d):
        dd = docs(spark, d)
        planted = (dd.where(F.col("doc_id") % 40 == 0)
                   .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                           F.col("text")))
        return dd.select("doc_id", "text").unionByName(planted)

    # --- cosine_near_dups decomposition
    def cos_union(spark, d):
        e = emb(spark, d)
        planted = (e.where(F.col("vec_id") % 25 == 0)
                   .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                           F.col("embedding")))
        return e.select("vec_id", "embedding").unionByName(planted)

    def cos_buckets(spark, d):
        return S.with_lsh_bucket(cos_union(spark, d), "embedding", 12, 42, 64)

    def cos_pairs(spark, d):
        from sdk_spark.operators.dedup import _bucket_pairs
        b = S.with_lsh_bucket(cos_union(spark, d), "embedding", 12, 42, 64) \
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("v"), "lsh_bucket")
        return _bucket_pairs(b, ["lsh_bucket"], ["v"], None) \
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))

    def cos_full(spark, d):
        import __spark_entry__ as e
        return e.q_cosine_near_dups(spark, d)

    # --- kmeans decomposition
    def km_train_only(spark, d):
        C = S.train_ivf_centroids(emb(spark, d), k=8, iters=5, spherical=True)
        return spark.range(1).select(F.lit(float(C[0][0])).alias("x"))

    def km_full(spark, d):
        import __spark_entry__ as e
        return e.q_embedding_ann_kmeans(spark, d)

    # --- phash decomposition
    def ph_floor(spark, d):
        # scan + trivial projection: the fixed-cost floor to subtract
        # from ph_fp when judging the fingerprint expression's own cost
        return (docs(spark, d)
                .where(F.col("text").isNotNull())
                .select("doc_id", F.length("text").alias("phash")))

    def ph_fp(spark, d):
        # the letter-count fingerprint projection alone (15 replace()
        # scans per row in the Catalyst form)
        import __spark_entry__ as e
        return (docs(spark, d)
                .where(F.col("text").isNotNull())
                .select("doc_id",
                        F.expr(e._FP_EXPR).cast("long").alias("phash")))

    def ph_reps(spark, d):
        # fingerprint + the collapse-identical-hashes aggregation
        import __spark_entry__ as e
        fp = (docs(spark, d)
              .where(F.col("text").isNotNull())
              .select("doc_id",
                      F.expr(e._FP_EXPR).cast("long").alias("phash")))
        return (fp.groupBy(F.col("phash").alias("id"))
                .agg(F.min("doc_id").alias("rep_id"),
                     F.count(F.lit(1)).alias("members")))

    def ph_full(spark, d):
        import __spark_entry__ as e
        return e.q_phash_near_dups(spark, d)

    def cc_full(spark, d):
        import __spark_entry__ as e
        return e.q_dedup_clusters(spark, d)

    # --- curate decomposition
    def cur_exact(spark, d):
        return D.distinct_by_content(docs(spark, d))

    def cur_full(spark, d):
        return bench.q_curate_corpus(spark, d)

    def uk_full(spark, d):
        import __spark_entry__ as e
        return e.q_unique_keys(spark, d)

    def ev_full(spark, d):
        import __spark_entry__ as e
        return e.q_event_sessions(spark, d)

    return {
        "mh_signature": mh_signature,
        "mh_candidates": mh_candidates,
        "mh_full": mh_full,
        "sh_signature": sh_signature,
        "sh_full": sh_full,
        "cos_buckets": cos_buckets,
        "cos_pairs": cos_pairs,
        "cos_full": cos_full,
        "km_train_only": km_train_only,
        "km_full": km_full,
        "ph_floor": ph_floor,
        "ph_fp": ph_fp,
        "ph_reps": ph_reps,
        "ph_full": ph_full,
        "cc_full": cc_full,
        "cur_exact": cur_exact,
        "cur_full": cur_full,
        "uk_full": uk_full,
        "ev_full": ev_full,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "10"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS")

    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = bench.ensure_scaled(spark, sf_dir, mult)
    spark.read.parquet(f"{data_dir}/lineitem.parquet").count()  # warm

    registry = _phases()
    names = sys.argv[1:] or list(registry)
    for name in names:
        fn = registry[name]
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.perf_counter()
            bench.force(fn(spark, data_dir))
            runs.append(round(time.perf_counter() - t0, 4))
        if plans_dir:
            import contextlib
            import io

            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, data_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        print(json.dumps({"phase": name, "sec": runs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


def _extra_minhash_rescore(spark, data_dir):
    """Isolate the rescore: materialize candidates once, then time the
    text join + arrow jaccard from parquet."""
    import json
    import time

    from pyspark.sql import functions as F

    from sdk_spark.operators import dedup as D

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    t0 = time.perf_counter()
    cands = D.minhash_lsh_candidates(D._ensure_parallelism(docs),
                                     "doc_id", "text", 128, 16, 5,
                                     D.DEFAULT_MAX_BUCKET, "arrow")
    cands.write.mode("overwrite").parquet("/tmp/mh_cands.parquet")
    t1 = time.perf_counter()
    n = spark.read.parquet("/tmp/mh_cands.parquet").count()
    pairs = spark.read.parquet("/tmp/mh_cands.parquet")
    t2 = time.perf_counter()
    scored = D.ngram_jaccard(docs, "doc_id", "text", pairs, 5, "arrow") \
        .where(F.col("jaccard") >= 0.7)
    bench.force(scored)
    t3 = time.perf_counter()
    print(json.dumps({"phase": "mh_decomp", "cands_write": round(t1 - t0, 3),
                      "n_cands": n, "rescore": round(t3 - t2, 3)}),
          flush=True)


if os.environ.get("MH_DECOMP"):
    pass
