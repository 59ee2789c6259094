#!/usr/bin/env python3
"""Registry-wide output-type audit (r13 verdict item 3).

Usage: python3 tools/type_audit.py <verifyOutDir>

Walks every query's Spark output parquet schema under <verifyOutDir> and
asserts the driver-hashable output-type contract: columns must be
integer/float/string/bool/date/timestamp — NEVER decimal (the driver's
typed hash canonicalizes DuckDB decimals to float64 but has no rule for
Spark-side decimals: r07 note + r13's 3-for-3 q314/q331/q348). Schema-only
read: runs over the full registry in seconds, no data touched.
"""
import sys, glob, os
import pyarrow.parquet as pq
import pyarrow as pa

ALLOWED = (pa.types.is_integer, pa.types.is_floating, pa.types.is_string,
           pa.types.is_large_string, pa.types.is_boolean, pa.types.is_date,
           pa.types.is_timestamp, pa.types.is_binary, pa.types.is_null)


def main():
    outdir = sys.argv[1]
    n_ok = n_bad = 0
    for qdir in sorted(glob.glob(f"{outdir}/q*")):
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            continue
        name = os.path.basename(qdir)
        schema = pq.read_schema(files[0])
        bad = []
        for f in schema:
            t = f.type
            # list/struct outputs are driver-comparable only through
            # their leaves; audit leaves recursively
            stack = [(f.name, t)]
            while stack:
                path, ty = stack.pop()
                if pa.types.is_list(ty) or pa.types.is_large_list(ty):
                    stack.append((path + "[]", ty.value_type))
                elif pa.types.is_struct(ty):
                    for sub in ty:
                        stack.append((path + "." + sub.name, sub.type))
                elif pa.types.is_decimal(ty):
                    bad.append(f"{path}: {ty}")
                elif not any(p(ty) for p in ALLOWED):
                    bad.append(f"{path}: {ty} (unexpected)")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad)}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"type_audit: {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
