#!/usr/bin/env python3
"""DuckDB-side baseline: time each oracle SQL at a given SF (default sf0.1).
Usage: python3 tools/bench_duck.py [sfdir] [oracle_json]
"""
import json, sys, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
out = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        out[name] = round(time.time() - t0, 4)
    except Exception as e:
        out[name] = None
print(json.dumps(out, indent=0))
