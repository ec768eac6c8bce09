#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
(already done by caller via sbt), then execute each oracle_sql.json entry
in DuckDB over the same parquet tables and diff against the Spark parquet
output (columns sorted by name, rows sorted, exact value compare)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"MISSING-SPARK {name}")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fails += 1
        continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"ROWS-MISMATCH {name}: spark={len(got)} oracle={len(exp)}")
        fails += 1
        continue
    try:
        eq = got.astype(str).equals(exp.astype(str))
    except Exception:
        eq = False
    if eq:
        print(f"OK {name} ({len(got)} rows)")
    else:
        print(f"VALUE-MISMATCH {name}")
        diff = (got.astype(str) != exp.astype(str))
        idx = diff.any(axis=1)
        print("spark:", got[idx].head(3).to_dict("records"))
        print("oracle:", exp[idx].head(3).to_dict("records"))
        fails += 1

# queries without oracle: rows-only check
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle:
        continue
    files = glob.glob(f"{d}*.parquet")
    if not files:
        print(f"ROWS-ONLY-EMPTY {name}")
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    print(f"ROWS-ONLY {name}: {n} rows")

print(f"\n{'PASS' if fails == 0 else 'FAIL'} ({fails} failures)")
sys.exit(1 if fails else 0)
