#!/bin/sh
# Same-box A/B for the r17 watch-list analytics cluster (VERDICT r17
# "Next round" #4): q106..q112 + q10 read 2.0-2.9x the builder's
# same-box warm in the r17 DRIVER bench only — contiguous IDs, all
# sub-second on the builder box, the signature of a driver-box
# transient — but the watch-list discipline says A/B it, not assume.
# Build BOTH jars first (the jar-swap hazard: never package while a
# battery runs), then run the same SPARK_GRAFT_BENCH_ONLY subset
# interleaved A/B/A/B on this box and compare per-query warm medians
# against the r17 closing commit.
#
#   sh tools/r18/watch_ab.sh > evidence/r18/watch_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q106_zipf_slope,q107_token_entropy,q108_event_funnel,q109_mad_outlier,q110_type_transitions,q111_cohort_retention,q112_ks_distance,q10_event_gaps
R17=3f8b59b
rm -rf /tmp/ab_r17 && mkdir -p /tmp/ab_r17
git archive $R17 | tar -x -C /tmp/ab_r17
(cd /tmp/ab_r17 && sbt -batch package > /tmp/ab_r17_build.log 2>&1)
sbt -batch package > /tmp/ab_head_build.log 2>&1
for i in 1 2 3; do
  for side in r17 head; do
    if [ $side = r17 ]; then
      JAR=/tmp/ab_r17/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
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
for side in ("r17", "head"):
    qs = {}
    for i in (1, 2, 3):
        d = json.load(open(f"/tmp/ab_{side}_{i}.json"))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
    med[side] = {k: sorted(v)[1] for k, v in sorted(qs.items())}
    print(side, json.dumps(med[side]))
print("ratios", json.dumps({k: round(med["head"][k] / med["r17"][k], 3)
                            for k in med["head"]}))
PY
echo WATCH_AB_DONE
