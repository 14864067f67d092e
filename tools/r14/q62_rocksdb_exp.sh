#!/bin/bash
# q62 RocksDB first-batch probe (VERDICT r13 next-round #4): the 50k-event
# bulk-ingest first batch read 30.2 s under RocksDB in r13 (SCALE.md
# §8.3). One experiment: the RocksDB maintenance/write-path confs most
# implicated in bulk ingest —
#   variant B disables trackTotalNumberOfRows (removes the read-before-
#             write RocksDB does per put to maintain the row counter —
#             the documented bulk-load lever),
#   variant C adds a 256 MB write buffer (fewer memtable flushes).
# Each variant runs Bench filtered to q62 on the 50k-doc corpus with the
# RocksDB provider; the number that matters is streaming_batch_ms[0].
set -e
cd /root/repo
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
DIR=${1:-/tmp/scale_10x_r13}
OUT=evidence/r14/q62_rocksdb_exp.log
: > $OUT
run() {
  local tag="$1"; shift
  local benchout="/tmp/q62exp_${tag}.json"
  SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_STATE_STORE=rocksdb \
  SPARK_GRAFT_BENCH_ONLY=q62_stream_stream_join \
  SPARK_GRAFT_BENCH_OUT=$benchout \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
    --conf spark.sql.legacy.parquet.nanosAsLong=true \
    "$@" --class graft.Bench $JAR > /tmp/q62exp_${tag}.stdout 2>/dev/null
  python3 - "$tag" "$benchout" >> $OUT <<'PY'
import json, sys
d = json.load(open(sys.argv[2]))
ms = d["streaming_batch_ms"].get("q62_stream_stream_join", [])
print(f"variant={sys.argv[1]} batch_ms={ms} wall_cold={d['queries']['q62_stream_stream_join']:.2f}s wall_warm={d['queries_warm']['q62_stream_stream_join']:.2f}s")
PY
  tail -1 $OUT
}
run A_default
run B_noTrackRows --conf spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false
run C_noTrack_bigWriteBuf \
  --conf spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false \
  --conf spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB=256
echo done
# (appended after the first run showed A/B/C flat): variant D tests
# changelog checkpointing — the RocksDB provider's default commit
# uploads a FULL snapshot of the store per batch, which on the
# bulk-ingest batch means re-writing all ~50k just-ingested rows into
# the checkpoint; changelog mode writes the delta log instead.
