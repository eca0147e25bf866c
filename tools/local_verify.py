#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL on the same sfDir tables, compare per query.

Usage: python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    # canonical row order: sort by all columns stringified
    key = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1)
    df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    import time
    t0 = time.time()
    def record(name, val):
        results[name] = val
        print(f"[{time.time()-t0:7.1f}s] {name:24s} {val}", flush=True)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only is not None and name not in only:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            record(name, "NO_OUTPUT")
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            record(name, f"ROWS_ONLY rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            record(name, f"ORACLE_SQL_ERROR {e}")
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            record(name, f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}")
            continue
        if len(g) != len(e):
            record(name, f"ROWCOUNT got={len(g)} exp={len(e)}")
            continue
        mismatch = None
        for c in g.columns:
            gc, ec = g[c], e[c]
            if gc.dtype.kind == "f" or ec.dtype.kind == "f":
                import numpy as np
                ga = gc.astype(float).to_numpy()
                ea = ec.astype(float).to_numpy()
                neq = ~((ga == ea) | (pd.isna(ga) & pd.isna(ea)))
            else:
                neq = ~((gc.astype(str) == ec.astype(str)) |
                        (gc.isna() & ec.isna()))
            if neq.any():
                i = int(neq.to_numpy().nonzero()[0][0]) if hasattr(neq, "to_numpy") else int(neq.nonzero()[0][0])
                mismatch = f"COL {c} row {i}: got={g[c].iloc[i]!r} exp={e[c].iloc[i]!r}"
                break
        record(name, mismatch or "OK")
    ok = sum(1 for v in results.values() if v == "OK")
    ro = sum(1 for v in results.values() if str(v).startswith("ROWS_ONLY"))
    for k, v in results.items():
        print(f"{k:24s} {v}")
    print(f"\n{ok} OK, {ro} rows-only, {len(results)-ok-ro} FAILING of {len(results)}")
    return 0 if ok + ro == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
