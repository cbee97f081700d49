#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sf tables registered as views, loads the corresponding Spark parquet
output, sorts columns by name and rows by all columns, and compares
cell-by-cell (exact, which is what a hash compare amounts to).
"""
import json, sys, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for stable sorting/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def _is_float(x):
    return isinstance(x, (float, np.floating))

def _is_bool(x):
    return isinstance(x, (bool, np.bool_))

def _is_int(x):
    return isinstance(x, (int, np.integer)) and not _is_bool(x)

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    # Type-strict: the driver hashes rendered values, so int64 3 and
    # float64 3.0 must NOT compare equal here — that laxity is exactly
    # how DuckDB HUGEINT->float64 drift shipped as a false local green.
    # Same for booleans: True == 1 == 1.0 in Python, but 'true' != '1'
    # under the driver's hash.
    if _is_bool(a) != _is_bool(b):
        return False
    if (_is_float(a) and _is_int(b)) or (_is_int(a) and _is_float(b)):
        return False
    if _is_float(a) and _is_float(b):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ERR   {name}: {str(e)[:200]}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        bad = None
        for c in g.columns:
            gv, wv = g[c].values, w[c].values
            mism = [i for i in range(len(gv)) if not cells_equal(gv[i], wv[i])]
            if mism:
                i = mism[0]
                bad = f"col {c}: {len(mism)} mismatches, first at row {i}: {gv[i]!r} vs {wv[i]!r}"
                break
        if bad:
            print(f"FAIL  {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
