#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB to produce the bench denominator.

Usage: python3 tools/bench_oracle.py <sf_dir> <oracle_sql.json> [out.json]

Runs every query from oracle_sql.json against DuckDB views over the
testdata parquet at <sf_dir>, `reps` times each (materializing the full
result set, the analogue of the Spark bench's noop sink), and writes
per-query wall-times (median of reps) plus the total to out.json
(default BASELINE_QUERIES.json). This is the numeric denominator for
BASELINE.md's "within 2x of BASELINE" gate.
"""
import json, statistics, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
REPS = 3


def main(sf_dir, oracle_path, out_path="BASELINE_QUERIES.json"):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    times = {}
    for name in sorted(oracle):
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            reps.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(reps), 4)
        print(f"{name}: {times[name]} s (reps: {[round(r, 3) for r in reps]})")
    out = {
        "engine": "duckdb",
        "version": duckdb.__version__,
        "sf_dir": sf_dir,
        "reps": REPS,
        "stat": "median",
        "unit": "sec",
        "total": round(sum(times.values()), 4),
        "queries": times,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(f"\ntotal {out['total']} s over {len(times)} queries -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
