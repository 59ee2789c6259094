#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Runs each oracle SQL (outDir/oracle_sql.json) in DuckDB over the parquet
tables in sfDir, loads the Spark result parquet from outDir/<name>, and
compares: column names (sorted), row count, and values (rows sorted by all
columns; floats compared exactly AND with tolerance so we can see margin).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, ints to int64 where possible
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = f"{outdir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{spark_path}/*.parquet"))])
        o, s = canon(odf), canon(sdf)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: cols oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1; continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1; continue
        ok, msg = True, ""
        for c in o.columns:
            oc, sc = o[c].values, s[c].values
            if pd.api.types.is_float_dtype(o[c]) or pd.api.types.is_float_dtype(s[c]):
                oc = np.asarray(oc, dtype=np.float64); sc = np.asarray(sc, dtype=np.float64)
                both_nan = np.isnan(oc) & np.isnan(sc)
                eq = (oc == sc) | both_nan
                if not eq.all():
                    bad = ~eq
                    diff = np.nanmax(np.abs(oc[bad] - sc[bad]))
                    rel = np.nanmax(np.abs(oc[bad] - sc[bad]) /
                                    np.maximum(np.abs(oc[bad]), 1e-300))
                    ok = False
                    msg = (f"col {c}: {bad.sum()}/{len(eq)} differ, "
                           f"maxabs={diff:.3e} maxrel={rel:.3e}")
                    break
            else:
                co = pd.Series(oc).astype(str); cs = pd.Series(sc).astype(str)
                if not (co == cs).all():
                    bad = (co != cs)
                    i = int(np.argmax(bad.values))
                    ok = False
                    msg = (f"col {c}: {bad.sum()}/{len(co)} differ, first@{i}: "
                           f"oracle={co.iloc[i]!r} spark={cs.iloc[i]!r}")
                    break
        if ok:
            print(f"PASS {name} ({len(o)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    # queries with no oracle (rows-only check)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle and glob.glob(f"{d}/*.parquet"):
            if only and name not in only: continue
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
            status = "ROWS" if n > 0 else "EMPTY"
            print(f"{status} {name} ({n} rows)")
            if n == 0: n_fail += 1
            else: n_skip += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
