#!/bin/bash
# r17 addendum: the four new index rows (xq114/115/116/117), all SFs.
set -uo pipefail
cd /root/repo
T=tools
NEW4="xq114_lsh_index_probe,xq115_lsh_index_append,xq116_ivfpq_index_probe,xq117_ivfpq_index_append"
ORACLE=/tmp/verify_out/oracle_sql.json
python3 $T/filter_oracle.py "$NEW4" $ORACLE /tmp/oracle_new4.json

echo "=== spark sf0.1 (2 passes)"
for pass in 1 2; do
  bash $T/bench_subset.sh /root/testdata/sf0.1 /tmp/sp_01_n4_p$pass.json "$NEW4" 32
done
python3 $T/reseed.py $T/sp_r17_min.json $T/sp_r17_min.json \
  --replace "$NEW4" /tmp/sp_01_n4_p1.json /tmp/sp_01_n4_p2.json
echo "=== duck sf0.1 (2 passes)"
for pass in 1 2; do
  python3 $T/bench_duck.py /root/testdata/sf0.1 /tmp/oracle_new4.json > /tmp/du_01_n4_p$pass.json
done
python3 $T/reseed.py $T/du_r17_min.json $T/du_r17_min.json \
  --replace "$NEW4" /tmp/du_01_n4_p1.json /tmp/du_01_n4_p2.json

for sf in 1 5 10; do
  echo "=== spark sf$sf (2 passes): $(date -u +%H:%M:%S)"
  for pass in 1 2; do
    bash $T/bench_subset.sh /root/repo/testdata_sf$sf /tmp/sp_sf${sf}_n4_p$pass.json "$NEW4" 32
  done
  python3 $T/reseed.py $T/sp_sf${sf}_r17_min.json $T/sp_sf${sf}_r17_min.json \
    --replace "$NEW4" /tmp/sp_sf${sf}_n4_p1.json /tmp/sp_sf${sf}_n4_p2.json
  echo "=== duck sf$sf: $(date -u +%H:%M:%S)"
  if [ "$sf" = "10" ]; then
    python3 $T/bench_duck_budget.py /root/repo/testdata_sf10 /tmp/oracle_new4.json 1800 /tmp/du_sf10_n4_p1.json
    python3 $T/reseed.py $T/du_sf10_r17_min.json $T/du_sf10_r17_min.json \
      --replace "$NEW4" /tmp/du_sf10_n4_p1.json
  else
    for pass in 1 2; do
      python3 $T/bench_duck.py /root/repo/testdata_sf$sf /tmp/oracle_new4.json > /tmp/du_sf${sf}_n4_p$pass.json
    done
    python3 $T/reseed.py $T/du_sf${sf}_r17_min.json $T/du_sf${sf}_r17_min.json \
      --replace "$NEW4" /tmp/du_sf${sf}_n4_p1.json /tmp/du_sf${sf}_n4_p2.json
  fi
done
echo "=== done $(date -u +%H:%M:%S)"
