#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Compares each <verifyOutDir>/<query>/ parquet against the oracle SQL in
<verifyOutDir>/oracle_sql.json run by DuckDB over <sfDir>/*.parquet.
Strict: sorts columns by name, checks row count, arrow column types, and
exact per-value equality (via python object comparison).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for q, sql in sorted(oracle.items()):
    qdir = f"{out_dir}/{q}"
    if not os.path.isdir(qdir):
        fails.append((q, "missing spark output")); continue
    got = pq.read_table(qdir)
    exp = con.execute(sql).arrow()
    got = got.select(sorted(got.column_names))
    exp = exp.select(sorted(exp.column_names))
    if got.column_names != exp.column_names:
        fails.append((q, f"cols {got.column_names} vs {exp.column_names}")); continue
    if got.num_rows != exp.num_rows:
        fails.append((q, f"rows {got.num_rows} vs {exp.num_rows}")); continue
    tmism = [f"{n}: {gt} vs {et}" for n, gt, et in
             zip(got.column_names, got.schema.types, exp.schema.types)
             if gt != et]
    if tmism:
        fails.append((q, "type " + "; ".join(tmism))); continue
    bad = []
    for n in got.column_names:
        g = got.column(n).to_pylist()
        e = exp.column(n).to_pylist()
        for i, (a, b) in enumerate(zip(g, e)):
            if a != b:
                bad.append(f"{n}[{i}]: {a!r} vs {b!r}")
                if len(bad) >= 5: break
        if len(bad) >= 5: break
    if bad:
        fails.append((q, "; ".join(bad))); continue
    print(f"PASS {q} ({got.num_rows} rows)")

for q, why in fails:
    print(f"FAIL {q}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
