#!/usr/bin/env python3
"""Mimic the driver's DuckDB-oracle compare: for each query result parquet
written by graft.Verify, run the oracle SQL in DuckDB over the same sf
tables and compare as sorted multisets (columns sorted by name)."""
import duckdb, json, sys, os, glob

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    res = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(res)}")
        continue
    exp = con.execute(oracle[name]).df()
    rc = sorted(res.columns); ec = sorted(exp.columns)
    if rc != ec:
        print(f"{name}: SCHEMA-MISMATCH spark={rc} duck={ec}"); fails += 1; continue
    def rows(df, cols):  # apply() on an empty frame yields a DataFrame
        if len(df) == 0:
            return []
        return df[cols].astype(str).apply(
            lambda row: "|".join(row), axis=1).sort_values().tolist()
    r = rows(res, rc)
    e = rows(exp, ec)
    if len(r) != len(e):
        print(f"{name}: ROWCOUNT-MISMATCH spark={len(r)} duck={len(e)}"); fails += 1; continue
    if r != e:
        diff = [(a, b) for a, b in zip(r, e) if a != b][:3]
        print(f"{name}: VALUE-MISMATCH e.g. {diff}"); fails += 1; continue
    print(f"{name}: OK rows={len(r)}")
missing = set(oracle) - {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
for m in missing:
    print(f"{m}: MISSING-RESULT"); fails += 1
sys.exit(1 if fails else 0)
