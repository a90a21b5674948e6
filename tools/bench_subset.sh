#!/bin/bash
# Run graft.Bench on a GRAFT_ONLY subset against one SF dir and save the
# one-line JSON payload (BENCH_LAST.json twin) to an output file.
#   tools/bench_subset.sh <sfdir> <outfile> <q1,q2,...> [cpus]
# Re-seed discipline (r15 verdict): a min-file row may only be committed
# from the code that is HEAD in the same commit — run this AFTER the
# plan-affecting edits of the round are committed, never between them.
set -euo pipefail
SFDIR=$1; OUT=$2; ONLY=$3; CPUS=${4:-32}
cd /root/repo
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" GRAFT_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" >/tmp/bench_subset_stdout.txt 2>&1 || {
    tail -20 /tmp/bench_subset_stdout.txt; exit 1; }
cp BENCH_LAST.json "$OUT"
grep -o '"scale_path_total":[0-9.]*' "$OUT" || true
