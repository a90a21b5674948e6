#!/usr/bin/env python3
"""Min-merge several bench JSON files (Spark Bench one-liners or
bench_duck.py outputs) into one {query: min_seconds} JSON on stdout.
Queries missing from a file are skipped for that file; -1 error sentinels
are ignored."""
import json
import sys


def load(path):
    text = open(path).read()
    obj = json.loads(text[text.index('{'):])
    return obj.get('queries', obj)


def main():
    merged = {}
    for path in sys.argv[1:]:
        for k, v in load(path).items():
            if v is None or v < 0:
                continue
            if k not in merged or v < merged[k]:
                merged[k] = v
    json.dump(merged, sys.stdout, indent=1)


if __name__ == '__main__':
    main()
