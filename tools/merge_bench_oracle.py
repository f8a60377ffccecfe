#!/usr/bin/env python3
"""Merge Spark (BENCH_FULL.json) and DuckDB (bench_oracle.py --json) per-query
times into one ratio artifact.

Usage: merge_bench_oracle.py <BENCH_FULL.json> <duck.json> <out.json>

Writes {queries: {name: {spark, duck, ratio}}, spark_total, duck_total,
ratio_total, ...}; ratio = spark/duck (< 1 means Spark is faster). Also
prints the top-10 queries by each ratio direction — the per-query visibility
that catches a single-query regression totals can hide.
"""
import json
import sys


def main():
    spark = json.load(open(sys.argv[1]))
    duck = json.load(open(sys.argv[2]))
    sq, dq = spark["queries"], duck["queries"]
    names = sorted(set(sq) & set(dq))
    missing = sorted(set(sq) ^ set(dq))
    if missing:
        print(f"WARNING: {len(missing)} queries only on one side: {missing}",
              file=sys.stderr)
    queries = {n: {"spark": round(sq[n], 4), "duck": round(dq[n], 4),
                   "ratio": round(sq[n] / dq[n], 3)} for n in names}
    out = {
        "queries": queries,
        "spark_total": round(sum(sq[n] for n in names), 3),
        "duck_total": round(sum(dq[n] for n in names), 3),
        "ratio_total": round(sum(sq[n] for n in names) /
                             sum(dq[n] for n in names), 3),
        "n_queries": len(names),
        "spark_reps": spark.get("reps"), "duck_reps": duck.get("reps"),
        "sf": spark.get("sf"),
    }
    # Floor-corrected view (alongside, never instead of, the raw totals):
    # subtract the session-measured no-op scheduling floor (floor_sec in
    # BENCH_FULL.json — a no-file single-stage count, pure DAGScheduler/
    # task-launch latency, invariant in data size) from each Spark query.
    # This separates engine cost from local-mode scheduling cost, the part
    # that amortizes to zero at production scale. DuckDB is in-process and
    # has no comparable floor, so its side stays raw.
    floor = spark.get("floor_sec")
    if floor:
        corrected = sum(max(sq[n] - floor, 0.0) for n in names)
        out["floor_sec"] = round(floor, 4)
        out["spark_total_floor_corrected"] = round(corrected, 3)
        out["ratio_total_floor_corrected"] = round(
            corrected / sum(dq[n] for n in names), 3)
    json.dump(out, open(sys.argv[3], "w"), indent=1, sort_keys=True)
    by_ratio = sorted(names, key=lambda n: -queries[n]["ratio"])
    print("slowest relative to DuckDB (ratio = spark/duck):")
    for n in by_ratio[:10]:
        q = queries[n]
        print(f"  {q['ratio']:7.2f}x  spark={q['spark']:7.3f}s "
              f"duck={q['duck']:7.3f}s  {n}")
    print("fastest relative to DuckDB:")
    for n in by_ratio[-10:][::-1]:
        q = queries[n]
        print(f"  {q['ratio']:7.2f}x  spark={q['spark']:7.3f}s "
              f"duck={q['duck']:7.3f}s  {n}")
    print(json.dumps({k: out[k] for k in
                      ("spark_total", "duck_total", "ratio_total",
                       "n_queries") + (("floor_sec",
                       "spark_total_floor_corrected",
                       "ratio_total_floor_corrected")
                       if "floor_sec" in out else ())}))


if __name__ == "__main__":
    main()
