#!/usr/bin/env python3
"""Dev-side stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>
Reads each <out>/<name> parquet written by graft.Verify plus oracle_sql.json,
runs the SQL in DuckDB over the sf_dir tables, and compares values with
columns sorted by name (the driver's documented behavior).
"""
import sys, json, glob, os
import duckdb, pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracles.items()):
    spark_df = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fail += 1; continue
    a2 = a.sort_values(by=list(a.columns), ignore_index=True).astype(str)
    b2 = b.sort_values(by=list(b.columns), ignore_index=True).astype(str)
    if not a2.equals(b2):
        diff = (a2 != b2).any(axis=1)
        print(f"FAIL {name}: value mismatch, first rows:\n{a2[diff].head(3)}\nvs\n{b2[diff].head(3)}")
        fail += 1; continue
    print(f"OK   {name} ({len(a)} rows)"); ok += 1
# queries with no oracle: rows-only check
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(d)
    if name in oracles or not os.path.isdir(d): continue
    n = len(duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df())
    print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
