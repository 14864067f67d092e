#!/bin/sh
# Streaming flush-family state-store experiment (VERDICT r19 #5).
# Same jar, same queries, ABBA over the provider: default
# (HDFSBackedStateStore) vs RocksDB (SPARK_GRAFT_STATE_STORE=rocksdb —
# the hook Bench/Verify already expose). The metric that matters is
# streaming_batch_ms_warm_median (steady-state per-batch cost), NOT the
# wall time (run lifecycle by construction).
#
#   sh tools/r20/statestore_ab.sh > evidence/r20/statestore_ab.log 2>&1
set -eu
cd "$(dirname "$0")/../.."
Q=q160_stream_index_flush,q161_stream_flush_threshold,q162_stream_flush_compact,q158_stream_lsh_index,q142b_stream_ann_append,q133_stream_chunk_dedup
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
i=0
for store in mem rocksdb rocksdb mem; do
  i=$((i + 1))
  if [ $store = rocksdb ]; then export SPARK_GRAFT_STATE_STORE=rocksdb
  else unset SPARK_GRAFT_STATE_STORE || true; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$Q \
  SPARK_GRAFT_BENCH_OUT=/tmp/ss_${store}_$i.json \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Bench "$JAR" > /tmp/ss_${store}_${i}.log 2>&1
  echo "run $i ($store) done"
done
python3 - <<'PY'
import glob, json
med = {}
for store in ("mem", "rocksdb"):
    qs = {}
    for f in sorted(glob.glob(f"/tmp/ss_{store}_*.json")):
        d = json.load(open(f))
        for k, v in d.get("streaming_batch_ms_warm_median", {}).items():
            qs.setdefault(k, []).append(v)
    for k, v in qs.items():
        s = sorted(v)
        med.setdefault(store, {})[k] = (s[1] + s[2]) / 2 if len(s) == 4 else s[len(s)//2]
    print(store, json.dumps({k: round(x, 1) for k, x in sorted(med[store].items())}))
print("ratios", json.dumps({k: round(med["rocksdb"][k] / med["mem"][k], 3)
                            for k in sorted(med["rocksdb"]) if med["mem"].get(k)}))
PY
echo STATESTORE_AB_DONE
