#!/bin/bash
# Round-17 measurement campaign — runs AFTER the round's plan-affecting
# commits (re-seed discipline). Strictly sequential; kill stray JVMs first.
#
# Re-seeded (REPLACED) rows — plan changed at HEAD:
#   xq57/xq103/xq108 (PQ family): pqEncode + the grouped trainer's
#     per-round assignment moved from explode->broadcast-join->min_by to
#     the native BestCentroidL2 argmin node (map-only).
# New rows (fresh, no prior): xq112_ivf_index_probe, xq113_ivf_index_append.
# DuckDB side: no oracle changed; only the NEW pair needs duck passes.
# Everything else min-merges.
set -uo pipefail
cd /root/repo
T=tools
PQ="xq53_sq8_topk,xq57_pq_topk,xq103_pq_index_probe,xq108_pq_index_append"
NEW="xq112_ivf_index_probe,xq113_ivf_index_append"
SUBSET="$PQ,$NEW"
REPLACE="xq57_pq_topk,xq103_pq_index_probe,xq108_pq_index_append"
ORACLE=/tmp/verify_out/oracle_sql.json

echo "=== [1/5] Spark sf0.1 full bench (2 passes)"
for pass in 1 2; do
  echo "--- sf0.1 full pass$pass: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_pass$pass.log 2>&1
  cp BENCH_LAST.json /tmp/sp_r17_pass$pass.json
done
python3 $T/reseed.py $T/sp_r16_min.json $T/sp_r17_min.json \
  --replace "$REPLACE" /tmp/sp_r17_pass1.json /tmp/sp_r17_pass2.json

echo "=== [2/5] DuckDB sf0.1 for the new pair (2 passes)"
python3 $T/filter_oracle.py "$NEW" $ORACLE /tmp/oracle_new.json
for pass in 1 2; do
  python3 $T/bench_duck.py /root/testdata/sf0.1 /tmp/oracle_new.json \
    > /tmp/du_r17_new_pass$pass.json
done
python3 $T/reseed.py $T/du_r16_min.json $T/du_r17_min.json \
  --replace "$NEW" /tmp/du_r17_new_pass1.json /tmp/du_r17_new_pass2.json

echo "=== [3/5] Spark decade subsets (2 passes each)"
for sf in 1 5 10; do
  for pass in 1 2; do
    echo "--- spark sf$sf pass$pass: $(date -u +%H:%M:%S)"
    bash $T/bench_subset.sh /root/repo/testdata_sf$sf \
      /tmp/sp_sf${sf}_r17_pass$pass.json "$SUBSET" 32
  done
  python3 $T/reseed.py $T/sp_sf${sf}_r16_min.json $T/sp_sf${sf}_r17_min.json \
    --replace "$REPLACE" /tmp/sp_sf${sf}_r17_pass1.json /tmp/sp_sf${sf}_r17_pass2.json
done

echo "=== [4/5] DuckDB decades for the new pair (budget-capped at sf10)"
for sf in 1 5; do
  for pass in 1 2; do
    python3 $T/bench_duck.py /root/repo/testdata_sf$sf /tmp/oracle_new.json \
      > /tmp/du_sf${sf}_new_pass$pass.json
  done
  python3 $T/reseed.py $T/du_sf${sf}_r16_min.json $T/du_sf${sf}_r17_min.json \
    --replace "$NEW" /tmp/du_sf${sf}_new_pass1.json /tmp/du_sf${sf}_new_pass2.json
done
python3 $T/bench_duck_budget.py /root/repo/testdata_sf10 /tmp/oracle_new.json \
  1800 /tmp/du_sf10_new_pass1.json
python3 $T/reseed.py $T/du_sf10_r16_min.json $T/du_sf10_r17_min.json \
  --replace "$NEW" /tmp/du_sf10_new_pass1.json

echo "=== [5/5] adjudication from the r17 min files"
python3 $T/floor_adjudicate.py | tail -40

echo "=== done: $(date -u +%H:%M:%S)"
