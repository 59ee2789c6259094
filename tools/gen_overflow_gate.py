#!/usr/bin/env python3
"""Derive tools/overflow_gate.txt from oracle SQL markers (r16 verdict #6).

The sf0.1 overflow gate re-runs, at 10x the standard gate scale, every
query whose failure modes are DATA-SCALE-DEPENDENT: an oracle that
widens through HUGEINT or near-max-precision DECIMAL can be green at
sf0.01 and overflow at sf0.1+, and an unrolled fixed-point recursion
(WITH RECURSIVE) compounds error with row count. The r16 list was a
frozen hand-maintained 58; this generator derives it from the oracle
SQL itself so new decimal-widened oracles AUTO-ENROLL.

Markers (case-insensitive, over each query's oracle SQL):
  - HUGEINT                      (128-bit accumulation)
  - DECIMAL(p, s) with p >= 30   (widened fixed-point: headroom is the
                                  whole point, so its exhaustion is
                                  scale-keyed by construction)
  - WITH RECURSIVE               (fixed-point recursion)

EXTRAS: queries whose SCALA side carries modular hash / rolling-sum
arithmetic with the same scale-keyed overflow risk but whose oracle
types are plain BIGINT (no SQL marker can see them) — each with the
reason it is enrolled.

Usage:
  python3 tools/gen_overflow_gate.py <verifyOutDir>          # rewrite list
  python3 tools/gen_overflow_gate.py <verifyOutDir> --check  # diff, exit 1
<verifyOutDir> must contain oracle_sql.json (any graft.Verify output).
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "overflow_gate.txt")

# Scala-side scale-keyed arithmetic with plain-BIGINT oracles (r16 hand
# enrollments that no SQL marker can derive):
EXTRAS = {
    "q300_seasonal_decompose": "centered 29-day rolling revenue sums — "
        "magnitude grows with row count, not calendar",
    "q305_feature_hashing": "Carter-Wegman modular hash mixing (< 2^62 "
        "invariant is row-value-dependent)",
    "q327_winnow": "rolling Rabin hash over shingles (same < 2^62 "
        "modular-arithmetic invariant)",
    "q337_compaction_plan": "running-bytes prefix sums over segment "
        "sizes — grow linearly with data",
    "q347_snapshot_diff": "per-row fingerprint hash mixing (q305's "
        "invariant class)",
}

MARKER = re.compile(r"HUGEINT|WITH\s+RECURSIVE|DECIMAL\s*\(\s*3[0-9]\b",
                    re.IGNORECASE)


def derive(oracle_sql_path):
    sql = json.load(open(oracle_sql_path))
    derived = {k for k, v in sql.items() if MARKER.search(v)}
    unknown_extras = set(EXTRAS) - set(sql)
    if unknown_extras:
        sys.exit(f"EXTRAS name unknown queries: {sorted(unknown_extras)}")
    return sorted(derived | set(EXTRAS))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    path = os.path.join(sys.argv[1], "oracle_sql.json")
    gate = derive(path)
    text = " ".join(gate) + "\n"
    if "--check" in sys.argv:
        cur = open(GATE).read().split()
        if cur != gate:
            extra = sorted(set(cur) - set(gate))
            missing = sorted(set(gate) - set(cur))
            print(f"overflow_gate.txt STALE: {len(missing)} missing "
                  f"{missing[:10]}{'...' if len(missing) > 10 else ''}, "
                  f"{len(extra)} extra {extra}")
            sys.exit(1)
        print(f"overflow_gate.txt up to date ({len(gate)} queries)")
    else:
        open(GATE, "w").write(text)
        print(f"overflow_gate.txt written: {len(gate)} queries")


if __name__ == "__main__":
    main()
