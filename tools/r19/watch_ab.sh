#!/bin/sh
# Same-box A/B, round 19. Two clusters in one interleaved battery:
#   1. VERDICT r18 "Next round" #4 watch list — q71, q121, q84, q23,
#      q61, q62, q63 read 1.4-2.0x r17-final in the r18 closing bench
#      but were in neither controlled A/B; adjudicate noise vs
#      regression. (q61's body CHANGES at r19 HEAD — for it this run
#      doubles as the optimization A/B.)
#   2. r19 optimization targets — q60/q60b (in-row PQ encode) and
#      q156 (kernel sub-assignment): before/after evidence.
# Build BOTH jars first (jar-swap hazard: never package while a battery
# runs), then run the same SPARK_GRAFT_BENCH_ONLY subset interleaved
# r18/head x3 and compare per-query warm medians.
#
#   sh tools/r19/watch_ab.sh > evidence/r19/watch_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q23_ngram_jaccard,q61_range_join,q62_stream_stream_join,q63_state_profile,q71_containment,q84_bm25_topk,q121_prefix_filter_join,q60_ann_pq,q60b_ann_pq_trained,q156_cell_repair,q93_perplexity_filter,q49_topterms,q66_boilerplate
R18=f1ca2d3
if [ ! -f /tmp/ab_r18/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar ]; then
  rm -rf /tmp/ab_r18 && mkdir -p /tmp/ab_r18
  git archive $R18 | tar -x -C /tmp/ab_r18
  (cd /tmp/ab_r18 && sbt -batch package > /tmp/ab_r18_build.log 2>&1)
fi
sbt -batch package > /tmp/ab_head_build.log 2>&1
for i in 1 2 3; do
  for side in r18 head; do
    if [ $side = r18 ]; then
      JAR=/tmp/ab_r18/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
    else
      JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
    fi
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$Q \
    SPARK_GRAFT_BENCH_OUT=/tmp/ab_${side}_$i.json \
    /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
      --class graft.Bench "$JAR" > /tmp/ab_${side}_${i}.log 2>&1
    echo "$side pass $i done"
  done
done
python3 - <<'PY'
import json
med = {}
for side in ("r18", "head"):
    qs = {}
    for i in (1, 2, 3):
        d = json.load(open(f"/tmp/ab_{side}_{i}.json"))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
    med[side] = {k: sorted(v)[1] for k, v in sorted(qs.items())}
    print(side, json.dumps(med[side]))
print("ratios", json.dumps({k: round(med["head"][k] / med["r18"][k], 3)
                            for k in med["head"]}))
PY
echo WATCH_AB_DONE
