#!/bin/sh
# Same-box A/B for the r16 watch-list queries (VERDICT r16 "What's
# wrong" #3 + "Next round" #5): q59/q58/q53 read 1.9-2.8x the r15 idle
# warm time in the r16 driver bench, and q60/q60b 1.5-1.8x, while their
# query bodies were untouched — the judge demanded the same same-box
# adjudication that cleared the r15 five (all noise, 0.948-1.046).
# Build BOTH jars first (the jar-swap hazard: never package while a
# battery runs), then run the same SPARK_GRAFT_BENCH_ONLY subset
# interleaved A/B/A/B on this box and compare per-query warm medians.
# For the streaming member (q59) the steady-state batch_ms median is
# printed beside warm (VERDICT r16 #8's triage number).
#
#   sh tools/r17/watch_ab.sh > evidence/r17/watch_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q59_stream_decontaminate,q58_filter_funnel,q53_interleave,q60_ann_pq,q60b_ann_pq_trained
R16=98b106a
rm -rf /tmp/ab_r16 && mkdir -p /tmp/ab_r16
git archive $R16 | tar -x -C /tmp/ab_r16
(cd /tmp/ab_r16 && sbt -batch package > /tmp/ab_r16_build.log 2>&1)
sbt -batch package > /tmp/ab_head_build.log 2>&1
for i in 1 2 3; do
  for side in r16 head; do
    if [ $side = r16 ]; then
      JAR=/tmp/ab_r16/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
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
batch = {}
for side in ("r16", "head"):
    qs = {}
    for i in (1, 2, 3):
        d = json.load(open(f"/tmp/ab_{side}_{i}.json"))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
        for k, v in d.get("streaming_batch_ms_warm_median", {}).items():
            batch.setdefault((side, k), []).append(v)
    med[side] = {k: sorted(v)[1] for k, v in sorted(qs.items())}
    print(side, json.dumps(med[side]))
print("ratios", json.dumps({k: round(med["head"][k] / med["r16"][k], 3)
                            for k in med["head"]}))
print("batch_ms_medians", json.dumps(
    {f"{s}:{k}": sorted(v)[len(v) // 2] for (s, k), v in sorted(batch.items())}))
PY
echo WATCH_AB_DONE
