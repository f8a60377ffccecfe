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
    # Floor-corrected view (alongside, never instead of, the raw totals).
    # The Spark bench session measures its own scheduling floor (floor_sec:
    # a no-file 1-stage count — pure DAGScheduler/task-launch latency,
    # invariant in data size) plus the incremental cost of one extra stage
    # (stage_floor_incr_sec: 2-stage no-data shuffle minus floor_sec), and
    # records each query's ACTUAL scheduled work (jobs/stages maps from a
    # SparkListener). Each query's modeled floor is then
    #     jobs x floor_sec + (stages - jobs) x stage_floor_incr_sec
    # so a cross-round per-query delta separates floor-change (jobs/stages
    # and the session floor explain it) from data-change (they don't) —
    # no manual adjudication round. This is still a MODEL (scheduling cost
    # approximated from session-measured no-op latencies, and DuckDB's
    # in-process side stays raw because it has no comparable floor), which
    # is why the raw ratio is always reported first. When jobs/stages are
    # absent (pre-round-9 artifact) fall back to one floor per query.
    floor = spark.get("floor_sec")
    if floor:
        jobs, stages = spark.get("jobs", {}), spark.get("stages", {})
        incr = spark.get("stage_floor_incr_sec", 0.0)

        def qfloor(n):
            j = jobs.get(n)
            if j is None:
                return floor  # legacy artifact: one floor per query
            extra = max(stages.get(n, j) - j, 0)
            return j * floor + extra * incr

        corrected_q = {n: max(sq[n] - qfloor(n), 0.0) for n in names}
        for n in names:
            if n in jobs:
                queries[n]["jobs"] = jobs[n]
                queries[n]["stages"] = stages.get(n)
                queries[n]["spark_floor_corrected"] = round(corrected_q[n], 4)
                if dq[n] > 0:
                    queries[n]["ratio_floor_corrected"] = round(
                        corrected_q[n] / dq[n], 3)
        corrected = sum(corrected_q.values())
        out["floor_sec"] = round(floor, 4)
        if "stage_floor_incr_sec" in spark:
            out["stage_floor_incr_sec"] = round(incr, 4)
            out["floor_model"] = ("per-query: jobs*floor_sec + "
                                  "(stages-jobs)*stage_floor_incr_sec; "
                                  "duck side raw (no comparable floor)")
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
