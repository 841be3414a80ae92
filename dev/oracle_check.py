#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same sf dir and compare
(columns sorted by name, rows sorted, values EXACTLY stringified).

The driver's hash proved bitwise- and type-sensitive (round 2: sum_charge
failed on low float bits, pack_bins on HUGEINT vs BIGINT) — so this replica
compares full float repr, not a %.6g grid, and result column types, not
just names. Anything that passes here should pass the driver.

Usage: oracle_check.py <sfdir> <verify_outdir>
Dev-side tool only (duckdb/pyarrow are driver-side; the Scala library never
uses them)."""
import json, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))  # exact shortest-repr: bit differences show
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

fails = 0

# Hard-fail on queries that THREW during the dump (Verify writes the list):
# a throwing query is otherwise simply absent from the compare, which is
# exactly how the round-6 events.ts regression went unnoticed locally.
import os
failed_path = f"{outdir}/failed.txt"
if os.path.exists(failed_path):
    for name in open(failed_path).read().split():
        print(f"{name:24s} THREW during Verify dump !!")
        fails += 1
# ...and on oracle keys with no dumped result directory at all
dumped = {d.split("/")[-1] for d in glob.glob(f"{outdir}/q_*")}
for name in sorted(set(oracles) - dumped):
    print(f"{name:24s} MISSING from dump (oracle exists, no parquet) !!")
    fails += 1

for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = d.split("/")[-1]
    got_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    got = canon(got_rel.fetchall(), got_rel.columns)
    if name not in oracles:
        status = f"rows-only ({len(got)} rows)" if got else "rows-only EMPTY !!"
        if not got: fails += 1
        print(f"{name:24s} {status}")
        continue
    try:
        exp_rel = con.sql(oracles[name])
        exp = canon(exp_rel.fetchall(), exp_rel.columns)
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    got_schema = sorted(zip(got_rel.columns, map(str, got_rel.types)))
    exp_schema = sorted(zip(exp_rel.columns, map(str, exp_rel.types)))
    if got_schema != exp_schema:
        print(f"{name:24s} SCHEMA MISMATCH spark={got_schema} duck={exp_schema}")
        fails += 1
    elif got == exp:
        print(f"{name:24s} OK ({len(got)} rows)")
    else:
        exp_set, got_set = set(exp), set(got)
        only_g = [r for r in got if r not in exp_set][:3]
        only_e = [r for r in exp if r not in got_set][:3]
        print(f"{name:24s} VALUE MISMATCH got={len(got)} exp={len(exp)} "
              f"spark-only={only_g} duck-only={only_e}")
        fails += 1
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
