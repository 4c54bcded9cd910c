#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against DuckDB executing oracle_sql.json on the same tables.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
(Run graft.Verify first to populate outDir.)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    try:
        all_queries = set(json.load(open(f"{out}/queries.json")))
    except FileNotFoundError:
        all_queries = set(oracle)
    n_pass = n_fail = 0
    results_dirs = sorted(d for d in os.listdir(out)
                          if os.path.isdir(os.path.join(out, d)))
    for name in results_dirs:
        parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = norm(pd.concat([pq.read_table(p).to_pandas() for p in parts]))
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "EMPTY"
            print(f"{status} {name}: {len(got)} rows (no oracle)")
            if len(got) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            if g.dtype.kind == 'f' or (hasattr(e, 'dtype') and e.dtype.kind == 'f'):
                eq = np.isclose(g.astype(float), e.astype(float),
                                rtol=0, atol=0, equal_nan=True)
            else:
                gs = pd.Series(g).astype(object)
                es = pd.Series(e).astype(object)
                eq = (gs.eq(es) | (gs.isna() & es.isna())).values
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row {i}]: got={g[i]!r} exp={e[i]!r}")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad[:3])}"); n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows"); n_pass += 1
    missing = all_queries - set(results_dirs)
    for m in sorted(missing):
        print(f"FAIL {m}: query produced no output dir"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
