"""Dump ``.explain("formatted")`` for bench queries into a directory.

Usage:
  python tools/dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (default: the r06
optimization-target set).  Uses the same session configuration as the
frozen bench harness so plan shapes match what the driver times.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = f"{REPO}{os.pathsep}" + os.environ.get("PYTHONPATH", "")

DEFAULT = ["minhash_dedup", "curate_corpus", "simhash_near_dups",
           "cosine_near_dups", "embedding_topk", "lang_id", "text_quality",
           "unique_keys", "unique_violation_rows", "event_sessions",
           "phash_near_dups", "vocab_topk", "exact_dup_count"]


def main() -> None:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    outdir.mkdir(parents=True, exist_ok=True)

    import bench
    import __spark_entry__ as entry

    spark = bench.build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "10"))
    data_dir = bench.ensure_scaled(spark, sf_dir, mult)

    registry = dict(entry.queries())
    registry["validate_full"] = bench.q_validate_full
    registry["minhash_dedup"] = bench.q_minhash_dedup
    registry["curate_corpus"] = bench.q_curate_corpus

    for name in names:
        fn = registry[name]
        try:
            df = fn(spark, data_dir)
            if isinstance(df, tuple):
                df = df[0]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (outdir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print("wrote", name, flush=True)
        except Exception as exc:  # keep going; report at the end
            print("FAILED", name, repr(exc), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
