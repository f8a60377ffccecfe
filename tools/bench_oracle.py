#!/usr/bin/env python3
"""Time the DuckDB oracle SQL set against the same parquet tables.

Usage: bench_oracle.py <sfDir> <verifyOutDir> [reps]

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Prints per-query best-of-N seconds and the total — the external yardstick
BASELINE.md quotes next to graft.Bench's number at the same scale factor.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"SET threads TO {__import__('os').cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps + 1):  # first rep doubles as warm-up
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = best
    total = sum(results.values())
    for name, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{dt:10.3f}  {name}")
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "n_queries": len(results),
                      "sf": sf_dir}))
    # per-query JSON for the Spark-vs-DuckDB ratio artifact
    # (BENCH_ORACLE_r{N}.json merges this with BENCH_FULL.json)
    if len(sys.argv) > 4:
        with open(sys.argv[4], "w") as f:
            json.dump({"queries": {k: round(v, 4) for k, v in results.items()},
                       "total": round(total, 3), "reps": reps,
                       "sf": sf_dir}, f)


if __name__ == "__main__":
    main()
