#!/bin/bash
# Round-16 measurement campaign — runs AFTER the round's plan-affecting
# commits, so every row records HEAD (re-seed discipline, r15 verdict #1).
# Strictly sequential: Spark and DuckDB timing runs never overlap.
#
# Re-seeded (REPLACED, not min-merged) rows:
#   events family (pq01/13/14/15/16/17, rq27, rq38) — events.parquet at
#     sf1/5/10 regenerated with the M_C user shift (both engines);
#   BestCentroid family (xq14/41/47/84/96) — the r15 committed decade rows
#     record the pre-BestCentroid plan (r15 verdict #1);
#   pq16 everywhere (plan: coalesce + sortWithinPartitions tail);
#   rq52 at sf10 (declared raised bloom caps now bind there).
# Everything else min-merges.
set -uo pipefail
cd /root/repo
T=tools
EV="pq01_daily_type_counts,pq13_sessionize,pq14_latest_per_user,pq15_sliding_window,pq16_funnel,pq17_cohort_retention,rq27_asof_join,rq38_string_agg"
ANN="xq14_ann_ivf,xq41_kmeans,xq47_semdedup,xq53_sq8_topk,xq57_pq_topk,xq84_cluster_sample,xq96_ann_serve,xq27_lsh_multiprobe,xq09_embedding_neardup"
ALL="$EV,$ANN,rq52_tpch_q21"
ORACLE=/tmp/verify_out/oracle_sql.json

echo "=== [1/6] Spark decade subsets (HEAD)"
for sf in 1 5 10; do
  for pass in 1 2; do
    echo "--- spark sf$sf pass$pass: $(date -u +%H:%M:%S)"
    bash $T/bench_subset.sh /root/repo/testdata_sf$sf \
      /tmp/sp_sf${sf}_r16_pass$pass.json "$ALL" 32
  done
done

echo "=== [2/6] DuckDB decade subsets (events family re-measure + new pairs)"
python3 $T/filter_oracle.py "$EV" $ORACLE /tmp/oracle_ev.json
for sf in 1 5 10; do
  for pass in 1 2; do
    echo "--- duck sf$sf pass$pass: $(date -u +%H:%M:%S)"
    python3 $T/bench_duck.py /root/repo/testdata_sf$sf /tmp/oracle_ev.json \
      > /tmp/du_sf${sf}_ev_pass$pass.json
  done
done
# new pairs, budget-capped where the oracle may be hours
python3 $T/filter_oracle.py "xq57_pq_topk" $ORACLE /tmp/oracle_xq57.json
python3 $T/bench_duck_budget.py /root/repo/testdata_sf10 /tmp/oracle_xq57.json 1800 /tmp/du_sf10_xq57.json
python3 $T/filter_oracle.py "xq47_semdedup" $ORACLE /tmp/oracle_xq47.json
python3 $T/bench_duck_budget.py /root/repo/testdata_sf5 /tmp/oracle_xq47.json 1800 /tmp/du_sf5_xq47.json
python3 $T/bench_duck_budget.py /root/repo/testdata_sf10 /tmp/oracle_xq47.json 1800 /tmp/du_sf10_xq47.json
python3 $T/filter_oracle.py "xq09_embedding_neardup" $ORACLE /tmp/oracle_xq09.json
python3 $T/bench_duck_budget.py /root/repo/testdata_sf5 /tmp/oracle_xq09.json 1800 /tmp/du_sf5_xq09.json

echo "=== [3/6] ScanFloor artifacts (job counts changed: pq16 plan + listener barrier)"
for sf in 1 5 10; do
  echo "--- scanfloor sf$sf: $(date -u +%H:%M:%S)"
  sbt -batch "runMain graft.ScanFloor /root/repo/testdata_sf$sf $T/scan_floor_sf$sf.json" \
    > /tmp/scanfloor_sf$sf.log 2>&1 || tail -5 /tmp/scanfloor_sf$sf.log
done

echo "=== [4/6] StageProbe pq16 @ sf10"
sbt -batch "runMain graft.StageProbe /root/repo/testdata_sf10 pq16" \
  > /tmp/stageprobe_pq16_sf10.log 2>&1
grep -E "STAGE|=====" /tmp/stageprobe_pq16_sf10.log | tee $T/stageprobe_pq16_sf10.txt

echo "=== [5/6] Full sf0.1 bench (pq16 gate-SF re-seed + r16 full payload)"
for pass in 1 2; do
  echo "--- sf0.1 full pass$pass: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_pass$pass.log 2>&1
  cp BENCH_LAST.json /tmp/sp_r16_pass$pass.json
done

echo "=== [6/6] done: $(date -u +%H:%M:%S)"
