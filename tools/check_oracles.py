"""Local twin of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare row count
+ column names + order-insensitive values (columns sorted by name).

Usage: python tools/check_oracles.py [--json OUT.json] [sf_dir] [query ...]

With --json, per-query verdicts are also written as one JSON object:
{"sf_dir": ..., "n_pass": ..., "n_fail": ..., "results": {name: {...}}} —
the round artifact (CORRECTNESS_LOCAL_r*.json) covering the full board,
including the q51+ queries the driver's own correctness file stops before.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    results = {}

    def record(name, status, **kw):
        results[name] = {"status": status, **kw}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__} {str(e)[:200]}")
            record(name, "FAIL", err=f"spark: {type(e).__name__} {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            record(name, "rows-only", rows=len(srows))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__} {str(e)[:200]}")
            record(name, "FAIL", err=f"duckdb: {type(e).__name__} {str(e)[:200]}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            record(name, "FAIL", err="column mismatch")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            record(name, "FAIL", err=f"rowcount {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        sk, ok_ = frame_key(srows, scols), frame_key(orows, ocols)
        if sk != ok_:
            diffs = [i for i, (a, b) in enumerate(zip(sk, ok_)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diffs}")
            for i in diffs[:2]:
                print(f"   spark : {sk[i]}")
                print(f"   oracle: {ok_[i]}")
            record(name, "FAIL", err="value mismatch")
            failures += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
        record(name, "PASS", rows=len(srows))
    print("FAILURES:", failures)
    if json_out:
        import json

        n_pass = sum(1 for r in results.values() if r["status"] != "FAIL")
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_checked": len(results),
                    "n_pass": n_pass,
                    "n_fail": failures,
                    "results": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
