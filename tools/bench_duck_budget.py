#!/usr/bin/env python3
"""Budget-bounded per-query DuckDB bench: like bench_duck.py, but each
query runs in its OWN subprocess under a wall-clock budget, so a query
that would run for hours (or die by OOM) records a bound instead of
hanging the sweep — the treatment the sf5/sf10 CC-family campaigns used,
made reusable.

Output JSON: {query: seconds} for completed queries,
{query: {"budget_exceeded": seconds}} for killed ones.

Usage: python3 tools/bench_duck_budget.py sfdir oracle.json budget_sec [out.json]
"""
import json
import subprocess
import sys
import time

sfdir, oracle_path = sys.argv[1], sys.argv[2]
budget = float(sys.argv[3])
out_path = sys.argv[4] if len(sys.argv) > 4 else None

CHILD = r"""
import json, sys, time
import duckdb
sfdir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
t0 = time.time()
con.execute(sql).fetchall()
print(json.dumps(time.time() - t0))
"""

oracle = json.load(open(oracle_path))
out = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", CHILD, sfdir],
                           input=oracle[name], capture_output=True,
                           text=True, timeout=budget)
        if r.returncode == 0:
            out[name] = round(json.loads(r.stdout.strip().splitlines()[-1]), 4)
        else:
            out[name] = {"error": r.stderr.strip()[-200:]}
    except subprocess.TimeoutExpired:
        out[name] = {"budget_exceeded": round(time.time() - t0, 1)}
    print(f"{name}: {out[name]}", file=sys.stderr)
if out_path:
    json.dump(out, open(out_path, "w"), indent=1)
print(json.dumps(out, indent=0))
