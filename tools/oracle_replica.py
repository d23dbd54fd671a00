"""Local replica of the driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, name-sorted schema, and a hash of sorted stringified tuples —
the same comparison the round driver records in CORRECTNESS_r{N}.json.

``normalize``/``make_duck``/``TABLES`` are THE shared replica helpers:
tests/test_entry_oracle.py imports them, so the pytest gate and this CLI
gate cannot silently diverge on rendering rules (an earlier version used
``%.6g`` floats here vs ``str()`` there — same query, different verdicts).

Usage:  python tools/oracle_replica.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def make_duck(sf_dir: str):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    """Engine-neutral cell canonicalization: Spark collects BINARY as
    bytearray while DuckDB returns bytes — identical payloads must render
    identically (repr differs: ``bytearray(b'..')`` vs ``b'..'``)."""
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def pandas_type_kinds(sdf, con, sql):
    """STRICT twin of the driver's likely hash path: both result sets
    fetched through pandas (Spark ``toPandas`` / DuckDB ``fetchdf``) and
    compared by per-column dtype kind + exact cell ``repr``.  This is
    what exposes e.g. DuckDB SUM -> HUGEINT surfacing as float64 OR
    object-of-int in pandas while Spark emits int64: values can print
    identically yet dtypes differ, which is how rows value-match but
    hash-amber in CORRECTNESS_r{N}.json.  ``sdf`` is the (cached) Spark
    DataFrame so the query is not executed a second time."""
    sdf = sdf.toPandas()
    odf = con.execute(sql).fetchdf()
    # duplicate output names break positional pandas indexing silently
    # (fetchdf renames the second 'a' to 'a_1' while cur.description keeps
    # both as 'a'); fail loudly instead of crashing mid-compare
    for side, cols in (("spark", list(sdf.columns)),
                       ("oracle", list(odf.columns))):
        if len(set(cols)) != len(cols):
            return [f"duplicate {side} output column names: {cols}"]
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    msgs = []
    for c in sdf.columns:
        if c not in odf.columns:
            msgs.append(f"dtype[{c}]: spark={sdf[c].dtype} oracle=MISSING")
            continue
        if sdf[c].dtype.kind != odf[c].dtype.kind:
            msgs.append(f"dtype[{c}]: spark={sdf[c].dtype} "
                        f"oracle={odf[c].dtype}")
    svals = sorted(repr(tuple(_canon(v) for v in t))
                   for t in sdf.itertuples(index=False, name=None))
    ovals = sorted(repr(tuple(_canon(v) for v in t))
                   for t in odf.itertuples(index=False, name=None))
    if svals != ovals:
        d = next((i for i, (a, b) in enumerate(zip(svals, ovals))
                  if a != b), -1)
        msgs.append(f"repr diff at sorted row {d}: spark={svals[d][:200]} "
                    f"oracle={ovals[d][:200]}")
    return msgs


def normalize(rows, colnames):
    """Order-insensitive stringified rows, name-sorted columns — the same
    rendering for BOTH engines (and both gate replicas: the pytest gate
    imports this).  ``str()`` everywhere: the strict pandas pass already
    proves exact ``repr`` equality for every green query, so a lossier
    float format here would only mask diffs, not absorb real ones."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return str(v)

    return sorted(tuple(render(r[i]) for i in order) for r in rows)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    import __spark_entry__ as m
    con = make_duck(sf)
    qs, oras = m.queries(), m.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not "pass" by validating nothing
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(qs)}")
        spark.stop()
        return 2
    fails, no_oracle, ran = [], [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        sdf = None
        try:
            # cache so the strict pandas pass reuses this execution
            # instead of running the full Spark job a second time
            sdf = fn(spark, sf).persist()
            scols = sorted(sdf.columns)
            srows = normalize(sdf.collect(), sdf.columns)
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"spark error: {e}"))
            if sdf is not None:
                sdf.unpersist()
            continue
        if name not in oras:
            no_oracle.append((name, len(srows)))
            sdf.unpersist()
            continue
        try:
            cur = con.execute(oras[name])
            ocols_raw = [d[0] for d in cur.description]
            orows = normalize(cur.fetchall(), ocols_raw)
            ocols = sorted(ocols_raw)
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"duckdb error: {e}"))
            sdf.unpersist()
            continue
        if scols != ocols:
            fails.append((name, f"schema: spark={scols} oracle={ocols}"))
        elif len(srows) != len(orows):
            fails.append((name, f"rows: spark={len(srows)} "
                                f"oracle={len(orows)}"))
        elif srows != orows:
            diff = next((i for i, (a, b) in enumerate(zip(srows, orows))
                         if a != b), -1)
            fails.append((name, f"hash: first diff at sorted row {diff}: "
                                f"spark={srows[diff]} oracle={orows[diff]}"))
        else:
            try:
                strict = pandas_type_kinds(sdf, con, oras[name])
            except Exception as e:  # noqa: BLE001 — a strict-pass crash is
                strict = [f"strict pass raised: {e}"]   # a FAIL, not an abort
            if strict:
                fails.append((name, f"STRICT: {'; '.join(strict)[:500]}"))
            else:
                print(f"  OK   {name:28s} {len(srows)} rows")
        sdf.unpersist()
    for name, n in no_oracle:
        print(f"  --   {name:28s} {n} rows (no oracle)")
    for name, msg in fails:
        print(f"  FAIL {name:28s} {msg}")
    skipped = len(qs) - ran
    print(f"{ran - len(fails) - len(no_oracle)} ok, "
          f"{len(no_oracle)} no-oracle, {len(fails)} FAIL"
          + (f" ({skipped} not run: name filter)" if skipped else ""))
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
