#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare per-query (rows / schema / values).

Usage: python3 tools/check.py [outdir] [sfdir]
  (expects graft.Verify to have been run first:
   sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out")
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
dirs = {d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d))}
for missing in sorted(set(oracle) - dirs):
    print(f"FAIL {missing}: no spark output directory")
    fails += 1
if not dirs:
    print("FAIL: zero query outputs produced")
    fails += 1
for name in sorted(dirs):
    path = os.path.join(outdir, name)
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        status = "rows-only" if len(got) > 0 else "EMPTY"
        if status == "EMPTY": fails += 1
        print(f"{'ok  ' if status=='rows-only' else 'FAIL'} {name}: {status} ({len(got)} rows)")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    bad = None
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            g = g.astype(e.dtype)
        except Exception:
            pass
        neq = ~((g == e) | (g.isna() & e.isna()))
        if neq.any():
            i = neq.idxmax()
            bad = (c, str(got[c].dtype), str(exp[c].dtype), i, got[c][i], exp[c][i])
            break
    if bad:
        c, gd, ed, i, gv, ev = bad
        print(f"FAIL {name}: col {c} ({gd} vs {ed}) row {i}: got {gv!r} exp {ev!r}")
        fails += 1
    else:
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        note = f" (dtype note: {dt})" if dt else ""
        print(f"ok   {name}: {len(got)} rows exact{note}")
print(f"\n{fails} failures" if fails else "\nALL GREEN")
sys.exit(1 if fails else 0)
