#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Verify parquet output, sort
columns by name + rows by value, and compare. Dev tool only (driver-side
python deps); the library itself never imports this."""
import json, sys, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Verify publishes each oracle under BOTH "q_x" and "q_x.parquet" (whatever
# key shape the driver reads, it finds one); here the bare name is canonical.
oracle = {k[:-8] if k.endswith(".parquet") else k: v for k, v in oracle.items()}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to comparable strings
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "item"):
            v = v.item()
        return str(v)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

fails, passes, skips = [], 0, 0
import glob, os
for name in sorted(oracle):
    if only and name not in only:
        continue
    pq = f"{out_dir}/{name}.parquet"
    if not os.path.exists(pq):
        fails.append((name, "missing spark output"))
        continue
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
    except Exception as e:
        fails.append((name, f"spark read error: {e}"))
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(duck_df)
    if len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} duck={len(b)}"))
        continue
    if sorted(spark_df.columns.str.lower()) != sorted(duck_df.columns.str.lower()):
        fails.append((name, f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
        continue
    if a != b:
        diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        fails.append((name, f"value mismatch at sorted-row {diff}:\n  spark={a[diff]}\n  duck ={b[diff]}"))
        continue
    passes += 1
    print(f"PASS {name} ({len(a)} rows)")

rows_only = [n for n in sorted(os.listdir(out_dir))
             if n.endswith(".parquet") and n[:-8] not in oracle]
for n in rows_only:
    print(f"ROWS-ONLY {n[:-8]}")

print(f"\n{passes} passed, {len(fails)} failed, {len(rows_only)} rows-only")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
