#!/usr/bin/env python3
"""Render the BASELINE.md measured table + SF trendline from paired bench
JSON files (Spark Bench one-liner + bench_duck.py output)."""
import json
import sys


def load_spark(path):
    line = open(path).read()
    obj = json.loads(line[line.index('{'):])
    return obj.get('queries', obj)  # raw Bench line or merge_bench output


def load_duck(path):
    return json.loads(open(path).read())


def main():
    sp1 = load_spark(sys.argv[1])   # spark sf0.1
    du1 = load_duck(sys.argv[2])    # duck  sf0.1
    sp0 = load_spark(sys.argv[3])   # spark sf0.01
    du0 = load_duck(sys.argv[4])    # duck  sf0.01

    print('| query | spark_s | duckdb_s | ratio |')
    print('|---|---|---|---|')
    tot_s = tot_d = 0.0
    for k in sorted(sp1):
        s = sp1[k]
        d = du1.get(k)
        if d is None:
            print(f'| {k} | {s:.3f} | — | rows-only |')
        else:
            tot_s += s
            tot_d += d
            print(f'| {k} | {s:.3f} | {d:.3f} | {s / d:.1f}x |')
    print(f'| **total (oracle-paired)** | **{tot_s:.2f}** | **{tot_d:.2f}** '
          f'| **{tot_s / tot_d:.1f}x** |')

    headline = ['rq02_tpch_q1', 'rq18_cte_selfjoin', 'rq26_median',
                'xq07_simhash', 'xq13_fingerprint', 'xq26_simhash_pairs',
                'xq31_ngram_jaccard_capped']
    print()
    print('| query | sf0.01 spark/duck | ratio | sf0.1 spark/duck | ratio | ratio shrink 10x data |')
    print('|---|---|---|---|---|---|')
    for k in headline:
        r0 = sp0[k] / du0[k]
        r1 = sp1[k] / du1[k]
        print(f'| {k} | {sp0[k]:.2f} / {du0[k]:.3f} | {r0:.1f}x '
              f'| {sp1[k]:.2f} / {du1[k]:.3f} | {r1:.1f}x | {r0 / r1:.1f}x |')


if __name__ == '__main__':
    main()
