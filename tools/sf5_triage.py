#!/usr/bin/env python3
"""Triage a full-suite sf5 Bench batch against prior sf5 minima.

Usage: python3 tools/sf5_triage.py BENCH_LAST.json tools/sp_sf5_r9_min.json [extra_min.json ...]

Prints, for every query in the batch:
  - batch seconds
  - best prior sf5 minimum across the given min files (if any)
  - ratio batch/prior, flagging rows >1.25x prior (solo re-pass candidates
    per the measurement discipline: batch passes inflate cache-heavy rows)
Rows with no prior minimum are listed separately (new queries or rows never
paired at sf5) — they need a solo pass to seed a minimum, not a re-pass.
"""
import json, sys

batch = json.load(open(sys.argv[1]))
bq = batch.get("queries", batch)
prior = {}
for p in sys.argv[2:]:
    d = json.load(open(p))
    for k, v in d.get("queries", d).items():
        if v and v > 0:
            prior[k] = min(prior.get(k, 1e18), v)

flag, ok, new, err = [], [], [], []
for k, v in sorted(bq.items()):
    if v is None or v < 0:
        err.append(k); continue
    if k in prior:
        r = v / prior[k]
        (flag if r > 1.25 else ok).append((r, k, v, prior[k]))
    else:
        new.append((k, v))

print(f"batch rows: {len(bq)}  errors: {len(err)}  {err if err else ''}")
print(f"\n-- INFLATED (> 1.25x prior min, solo re-pass) : {len(flag)}")
for r, k, v, p in sorted(flag, reverse=True):
    print(f"  {k}: batch {v:.2f}s vs prior {p:.2f}s = {r:.2f}x")
print(f"\n-- no prior sf5 minimum (seed solo if sf5-relevant): {len(new)}")
for k, v in sorted(new, key=lambda t: -t[1]):
    print(f"  {k}: {v:.2f}s")
print(f"\n-- within 1.25x of prior: {len(ok)} rows, "
      f"batch sum {sum(v for _,_,v,_ in ok):.1f}s vs prior sum {sum(p for _,_,_,p in ok):.1f}s")
for r, k, v, p in sorted(ok, reverse=True)[:10]:
    print(f"  {k}: {v:.2f} vs {p:.2f} = {r:.2f}x")
