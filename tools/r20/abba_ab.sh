#!/bin/sh
# Same-box A/B, round 20, take 2 — drift-cancelling ABBA order.
# The first battery (watch_ab.log) alternated r19/head ×3 and landed on
# a host-load wave: UNCHANGED-code queries read 1.18–1.78× and head
# pass 3 ran ~2–3× its own pass 1 uniformly — classic monotone drift
# that strict alternation cannot cancel. This battery runs the same
# 8-query subset in the order r19,head,head,r19,head,r19,r19,head
# (4 runs/side, first/second-order drift balanced) and compares
# per-query warm MEDIANS of 4.
#
#   sh tools/r20/abba_ab.sh > evidence/r20/abba_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q60_ann_pq,q60b_ann_pq_trained,q130_rrf_fusion,q61_range_join,q49_topterms,q36c_ann_ivf_coarse,q68b_semantic_dedup_trained,q156_cell_repair
i=0
for side in r19 head head r19 head r19 r19 head; do
  i=$((i + 1))
  if [ $side = r19 ]; then
    JAR=/tmp/ab_r19/target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
  else
    JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
  fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$Q \
  SPARK_GRAFT_BENCH_OUT=/tmp/abba_${side}_$i.json \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Bench "$JAR" > /tmp/abba_${side}_${i}.log 2>&1
  echo "run $i ($side) done"
done
python3 - <<'PY'
import glob, json
med = {}
for side in ("r19", "head"):
    qs = {}
    for f in sorted(glob.glob(f"/tmp/abba_{side}_*.json")):
        d = json.load(open(f))
        for k, v in d["queries_warm"].items():
            qs.setdefault(k, []).append(v)
    for k, v in qs.items():
        s = sorted(v)
        med.setdefault(side, {})[k] = (s[1] + s[2]) / 2 if len(s) == 4 else s[len(s)//2]
    print(side, json.dumps({k: round(x, 3) for k, x in sorted(med[side].items())}))
print("ratios", json.dumps({k: round(med["head"][k] / med["r19"][k], 3)
                            for k in sorted(med["head"])}))
PY
echo ABBA_AB_DONE
