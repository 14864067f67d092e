#!/bin/sh
# q60 200k-vector scale witness, round 20 edition: r19's witness killed
# the ENCODE's 160M-row sort-aggregate (r18 jar DNF'd); this one
# measures the r20 in-row ADC fold against the r19 jar on the same
# seeded 200k×64 corpus (tools/gen_vec_corpus.py seed 43 — the r19
# witness corpus), ABBA ×2 per side, standard bench methodology.
#
#   python3 tools/gen_vec_corpus.py 43 /tmp/pq200k 200000
#   sh tools/r20/pq200k_ab.sh > evidence/r20/pq200k_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
i=0
for side in r19 head head r19; do
  i=$((i + 1))
  if [ $side = r19 ]; then
    JAR=/tmp/ab_r19/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
  else
    JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
  fi
  SPARK_GRAFT_SF_DIR=/tmp/pq200k SPARK_GRAFT_BENCH_ONLY=q60_ann_pq \
  SPARK_GRAFT_BENCH_OUT=/tmp/pq200k_${side}_$i.json \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Bench "$JAR" > /tmp/pq200k_${side}_${i}.log 2>&1
  echo "run $i ($side) done: $(cat /tmp/pq200k_${side}_$i.json | python3 -c 'import json,sys; d=json.load(sys.stdin); print("cold", round(d["value"],1), "warm", round(d["value_warm"],1))')"
done
echo PQ200K_AB_DONE
