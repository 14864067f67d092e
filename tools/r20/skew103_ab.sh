#!/bin/sh
# q103 pair-generation skew witness (VERDICT r19 #7, guide §2.5).
# Corpus: tools/r20/gen_skew_corpus.py — every doc opens with the same
# 5-token run, so three shingles have df = n_docs (hot keys way past
# the df <= 50 cap) and the filler shingles have df = 1 (zero pairs —
# the measured work IS the posting aggregation under skew). The r19
# shape collect_list's each hot posting list into one reduce-task
# buffer before dropping it; the r20 CappedCollect caps the state at
# O(50) per group on every path.
#
#   python3 tools/r20/gen_skew_corpus.py 43 /tmp/skew103 2000000
#   sh tools/r20/skew103_ab.sh > evidence/r20/skew103_ab.log 2>&1
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
  SPARK_GRAFT_SF_DIR=/tmp/skew103 SPARK_GRAFT_BENCH_ONLY=q103_shingle_cosine \
  SPARK_GRAFT_BENCH_OUT=/tmp/skew103_${side}_$i.json \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Bench "$JAR" > /tmp/skew103_${side}_${i}.log 2>&1
  echo "run $i ($side) done: $(cat /tmp/skew103_${side}_$i.json | python3 -c 'import json,sys; d=json.load(sys.stdin); print("cold", round(d["value"],1), "warm", round(d["value_warm"],1), "failed", d["failed"])')"
done
echo SKEW103_DONE
