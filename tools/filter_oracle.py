#!/usr/bin/env python3
"""Write a filtered copy of oracle_sql.json restricted to the given query
names, for subset DuckDB bench runs (bench_duck.py runs every key it is
given — at sf1 the full set includes multi-minute exact scans you usually
don't want).

Usage: python3 tools/filter_oracle.py q1,q2,... [in_json] [out_json]
"""
import json
import sys

names = set(sys.argv[1].split(","))
src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/oracle_subset.json"

oracle = json.load(open(src))
missing = names - set(oracle)
if missing:
    sys.exit(f"unknown queries: {sorted(missing)}")
json.dump({k: oracle[k] for k in sorted(names)}, open(dst, "w"), indent=0)
print(f"{dst}: {len(names)} queries")
