#!/bin/sh
# Same-box A/B for the r15 watch-list queries (VERDICT r15 perf §: five
# queries read >1.3x the r14 warm time in the driver bench while their
# code was untouched between r14 HEAD aaa84e6 and r15 HEAD — the judge
# demanded a same-box adjudication: noise or regression). Build BOTH
# jars first (the jar-swap hazard: never package while a battery
# runs), then run the same SPARK_GRAFT_BENCH_ONLY subset interleaved
# A/B/A/B on this box and compare per-query warm medians.
#
#   sh tools/r16/watch_ab.sh > evidence/r16/watch_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q115_ngram_coverage,q130_rrf_fusion,q131_image_neardup,q68_semantic_dedup,q116_pagerank
R14=aaa84e6
rm -rf /tmp/ab_r14 && mkdir -p /tmp/ab_r14
git archive $R14 | tar -x -C /tmp/ab_r14
(cd /tmp/ab_r14 && sbt -batch package > /tmp/ab_r14_build.log 2>&1)
sbt -batch package > /tmp/ab_head_build.log 2>&1
for i in 1 2 3; do
  for side in r14 head; do
    if [ $side = r14 ]; then
      JAR=/tmp/ab_r14/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
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
for side in ("r14", "head"):
    qs = {}
    for i in (1, 2, 3):
        d = json.load(open(f"/tmp/ab_{side}_{i}.json"))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
    med[side] = {k: sorted(v)[1] for k, v in sorted(qs.items())}
    print(side, json.dumps(med[side]))
print("ratios", json.dumps({k: round(med["head"][k] / med["r14"][k], 3)
                            for k in med["head"]}))
PY
echo WATCH_AB_DONE
