#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against views over the testdata
parquet, and compares: column names (sorted), row count, and values
(rows compared in result order after sorting columns by name; floats via
round-trip repr).
"""
import json, math, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full round-trip precision, and '1.0' != '1': the driver's hash
        # distinguishes int from float (DuckDB HUGEINT sums arrive as
        # float64 through pandas), so the local gate must too.
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_val(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            # fetchdf, not fetchall: reproduces the driver's pandas-side
            # type coercions (DuckDB HUGEINT -> float64, etc.).
            odf = con.execute(sql).fetchdf()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if diffs:
            i, x, y = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} rows differ; first @ {i}:")
            print(f"  spark : {x}")
            print(f"  oracle: {y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
