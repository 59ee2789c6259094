#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [--json gate.json] [query ...]

--json writes a CORRECTNESS-shaped gate file ({name: {rows_match,
schema_match, hash_match, err}}) consumable by tools/coverage_audit.py,
so the close sweep can audit §2 parity against its OWN full run before
the driver writes the official artifact.

Runs each oracle SQL (outDir/oracle_sql.json) in DuckDB over the parquet
tables in sfDir, loads the Spark result parquet from outDir/<name>, and
compares: column names (sorted), row count, and values (rows sorted by all
columns; floats compared exactly AND with tolerance so we can see margin).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def arrow_decimal_cols(schema) -> set:
    return {f.name for f in schema if pa.types.is_decimal(f.type)}

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
    args = sys.argv[1:]
    gate_path = None
    if "--json" in args:
        i = args.index("--json")
        gate_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    gate = {}
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
            otab = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        odf = otab.to_pandas()
        spark_files = sorted(glob.glob(f"{spark_path}/*.parquet"))
        # Output-type contract (r13 verdict): driver-hashable output
        # types are BIGINT/DOUBLE/STRING/BOOL/DATE/TIMESTAMP — a
        # DecimalType column in the SPARK output schema is a guaranteed
        # driver hash mismatch (r13: q314/q331/q348, 3-for-3), however
        # value-exact the cells are. Decimals are internal only.
        s_schema = pq.read_schema(spark_files[0])
        s_dec = arrow_decimal_cols(s_schema)
        if s_dec:
            print(f"FAIL {name}: Spark output has DECIMAL column(s) "
                  f"{sorted(s_dec)} — the driver hash cannot canonicalize "
                  f"Spark-side decimals; cast the output to BIGINT "
                  f"(integer grids, widen via DECIMAL internally) or "
                  f"DOUBLE (rounded grids) in BOTH engines")
            n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
        # The driver hashes TYPED values after canonicalizing DECIMAL to
        # float64 (observed r07: decimal(p,s>0) vs spark DOUBLE passes;
        # decimal(38,0) integer-sum vs spark BIGINT hash-mismatches).
        # Mirror that: decimals become float64, then an int-vs-float kind
        # split between the two sides is a driver failure even when the
        # printed values are identical — no astype(str) smoothing there.
        for c in arrow_decimal_cols(otab.schema):
            odf[c] = odf[c].astype("float64")
        kind_bad = []
        for c in odf.columns:
            if c not in sdf.columns:
                continue
            o_i = pd.api.types.is_integer_dtype(odf[c])
            s_i = pd.api.types.is_integer_dtype(sdf[c])
            o_f = pd.api.types.is_float_dtype(odf[c])
            s_f = pd.api.types.is_float_dtype(sdf[c])
            if (o_i and s_f) or (o_f and s_i):
                kind_bad.append(
                    f"{c}: oracle {'int' if o_i else 'float'} vs "
                    f"spark {'int' if s_i else 'float'}")
        if kind_bad:
            print(f"FAIL {name}: int/float typing mismatch (driver hash "
                  f"gate would fail): {'; '.join(kind_bad)} — cast the "
                  f"oracle (e.g. CAST(sum(x) AS BIGINT) for integer sums)")
            n_fail += 1; continue
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
                # BIT-EXACT: the driver hashes the serialized float bits, so
                # -0.0 vs +0.0 and NaN-payload differences must FAIL here too.
                # Canonicalize NaNs to one pattern, then compare raw bits.
                canon_nan = np.float64("nan")
                ocb = np.where(np.isnan(oc), canon_nan, oc).view(np.int64)
                scb = np.where(np.isnan(sc), canon_nan, sc).view(np.int64)
                eq = ocb == scb
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
        gate[name] = {"rows_match": ok, "schema_match": ok,
                      "hash_match": ok, "err": None if ok else msg}
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
    if gate_path:
        json.dump(gate, open(gate_path, "w"), indent=1)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
