#!/usr/bin/env python3
"""Build a round-N min file from the previous round's file + fresh passes,
with the re-seed discipline the r15 verdict demanded: rows whose PLAN or
INPUT DATA changed since their last seed are REPLACED by the fresh
measurement (min across this round's fresh passes only — never min'd with
a stale-plan minimum, in either direction), everything else min-merges.

Usage:
  reseed.py <prev_min.json> <out.json> --replace q1,q2,... fresh1.json [fresh2.json ...]

A fresh row for a query NOT in --replace min-merges with the carried value.
A --replace query with no fresh row is DROPPED (its old number is known
stale; an absent row is honest, a stale one is not).
"""
import json
import sys


def load(path):
    text = open(path).read()
    obj = json.loads(text[text.index('{'):])
    q = obj.get('queries', obj)
    return {k: v for k, v in q.items() if v is not None and v >= 0}


def main():
    prev_path, out_path = sys.argv[1], sys.argv[2]
    assert sys.argv[3] == '--replace'
    replace = set(sys.argv[4].split(','))
    fresh_paths = sys.argv[5:]
    fresh = {}
    for p in fresh_paths:
        for k, v in load(p).items():
            if k not in fresh or v < fresh[k]:
                fresh[k] = v
    out = {}
    for k, v in load(prev_path).items():
        if k in replace:
            continue  # stale by declaration; re-enters only via fresh
        out[k] = v
    for k, v in fresh.items():
        if k in replace or k not in out:
            out[k] = v
        else:
            out[k] = min(out[k], v)
    dropped = sorted(q for q in replace if q not in fresh and q in load(prev_path))
    if dropped:
        print(f"note: replaced-but-unmeasured rows dropped: {dropped}",
              file=sys.stderr)
    with open(out_path, 'w') as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(out)} rows "
          f"({sum(1 for k in fresh if k in replace)} replaced, "
          f"{len(fresh)} fresh)")


if __name__ == '__main__':
    main()
