#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read Verify output
(outDir/<name> parquet dirs + oracle_sql.json), run each oracle SQL in
DuckDB over the same fixture parquet, and compare row-multisets.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)          # full precision
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_bad += 1
            continue
        g, e = multiset(got_rows, got_cols), multiset(exp_rows, exp_cols)
        if g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; first diffs: {diff}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
