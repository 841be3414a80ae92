#!/usr/bin/env python3
"""Run-to-run determinism audit: compare two graft.Verify output dirs.

The round-1 oracle failure (q_pricing_summary) was a RUN-TO-RUN float
flip — Spark partition order changed a double sum's last ulps and a
4-dp rounding flipped. Single-run oracle checks can't see that class;
this can. Usage:

    sbt "runMain graft.Verify <sfdir> /tmp/vA"
    sbt "runMain graft.Verify <sfdir> /tmp/vB"
    python3 dev/determinism_check.py /tmp/vA /tmp/vB

Expected: the only mismatch is q_ulid (nondeterministic by design).
Canonicalization mirrors the driver: columns sorted by name, rows
sorted, floats %.6g.
"""
import glob
import hashlib
import os
import sys

import duckdb


def canon(d, q):
    con = duckdb.connect()
    df = con.query(f"SELECT * FROM '{d}/{q}/*.parquet'").df()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].map(lambda x: f"{x:.6g}" if x == x else "nan")
    rows = sorted(map(tuple, df.astype(str).values.tolist()))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    qs = sorted(os.path.basename(p) for p in glob.glob(a + "/q_*"))
    bad = []
    for q in qs:
        try:
            if canon(a, q) != canon(b, q):
                bad.append(q)
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append(f"{q} ERR {e}")
    print(f"queries compared: {len(qs)}")
    unexpected = [q for q in bad if q != "q_ulid"]
    print("mismatches:", bad if bad else "none")
    if unexpected:
        print("UNEXPECTED NONDETERMINISM:", unexpected)
        sys.exit(1)
    print("OK (only by-design nondeterminism)")


if __name__ == "__main__":
    main()
