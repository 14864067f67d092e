#!/bin/sh
# Same-box A/B, round 20. One interleaved battery covering:
#   1. r20 optimization targets — q60/q60b (in-row ADC fold), q130
#      (TopKAgg channel top-20s + dl carried in-row).
#   2. Queries whose bodies changed for CORRECTNESS only and must stay
#      perf-neutral — q61 (empty-corpus zero contract), q49 (rleTfStr
#      token clone).
#   3. Kernel users exercising the L2ArgMinCid sampled-word cache key
#      (16 words vs 2 per row) — q36c, q68b, q156: must be neutral.
# Build BOTH jars first (jar-swap hazard: never package while a battery
# runs), then run the same SPARK_GRAFT_BENCH_ONLY subset interleaved
# r19/head x3 and compare per-query warm medians.
#
#   sh tools/r20/watch_ab.sh > evidence/r20/watch_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q60_ann_pq,q60b_ann_pq_trained,q130_rrf_fusion,q61_range_join,q49_topterms,q36c_ann_ivf_coarse,q68b_semantic_dedup_trained,q156_cell_repair
R19=2081499
if [ ! -f /tmp/ab_r19/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar ]; then
  rm -rf /tmp/ab_r19 && mkdir -p /tmp/ab_r19
  git archive $R19 | tar -x -C /tmp/ab_r19
  (cd /tmp/ab_r19 && sbt -batch package > /tmp/ab_r19_build.log 2>&1)
fi
sbt -batch package > /tmp/ab_head_build.log 2>&1
for i in 1 2 3; do
  for side in r19 head; do
    if [ $side = r19 ]; then
      JAR=/tmp/ab_r19/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
    else
      JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
    fi
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$Q \
    SPARK_GRAFT_BENCH_OUT=/tmp/ab20_${side}_$i.json \
    /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
      --class graft.Bench "$JAR" > /tmp/ab20_${side}_${i}.log 2>&1
    echo "$side pass $i done"
  done
done
python3 - <<'PY'
import json
med = {}
for side in ("r19", "head"):
    qs = {}
    for i in (1, 2, 3):
        d = json.load(open(f"/tmp/ab20_{side}_{i}.json"))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
    med[side] = {k: sorted(v)[1] for k, v in sorted(qs.items())}
    print(side, json.dumps(med[side]))
print("ratios", json.dumps({k: round(med["head"][k] / med["r19"][k], 3)
                            for k in med["head"]}))
PY
echo WATCH_AB_DONE
