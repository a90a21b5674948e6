#!/usr/bin/env python3
"""Paired-headline stats from a Spark min-merge + DuckDB min-merge JSON:
total paired seconds per engine, ratio, compute-bearing subtotal
(DuckDB >= 0.1 s), floor-dominated count, and the worst ratio rows.

Usage: python3 tools/headline.py sp_min.json du_min.json [old_sp.json]
With old_sp.json, also prints per-query Spark deltas beyond +-50% (the
documented tenant-noise envelope) for regression review.
"""
import json
import sys


def load(path):
    text = open(path).read()
    obj = json.loads(text[text.index('{'):])
    return obj.get('queries', obj)


def main():
    sp = load(sys.argv[1])
    du = load(sys.argv[2])
    paired = {k: (sp[k], du[k]) for k in sp
              if k in du and du[k] is not None and sp[k] is not None
              and sp[k] >= 0}
    ts = sum(s for s, _ in paired.values())
    td = sum(d for _, d in paired.values())
    print(f"paired queries: {len(paired)}")
    ratio = f"{ts/td:.2f}x" if td > 0 else "n/a (duck total 0)"
    print(f"paired total:   spark {ts:.2f} s vs duck {td:.2f} s = {ratio}")
    cb = {k: v for k, v in paired.items() if v[1] >= 0.1}
    cs = sum(s for s, _ in cb.values())
    cd = sum(d for _, d in cb.values())
    cratio = f"{cs/cd:.2f}x" if cd > 0 else "n/a"
    print(f"compute-bearing (duck >= 0.1 s): {len(cb)} queries, "
          f"spark {cs:.2f} vs duck {cd:.2f} = {cratio}")
    print(f"floor-dominated rows (duck < 0.1 s): {len(paired) - len(cb)}")
    print("\nworst ratios among compute-bearing:")
    for k, (s, d) in sorted(cb.items(), key=lambda kv: -kv[1][0]/kv[1][1])[:8]:
        print(f"  {k}: {s:.2f} / {d:.3f} = {s/d:.1f}x")
    if len(sys.argv) > 3:
        old = load(sys.argv[3])
        print("\nspark deltas beyond +-50% vs old minima:")
        moved = False
        for k in sorted(sp):
            if k in old and old[k] > 0 and sp[k] >= 0:
                r = sp[k] / old[k]
                if r > 1.5 or r < 0.5:
                    moved = True
                    print(f"  {k}: {old[k]:.2f} -> {sp[k]:.2f} ({r:.2f}x)")
        if not moved:
            print("  none")


if __name__ == '__main__':
    main()
