#!/bin/sh
# Twelve-seed oracle sweep for the round-13 additions (q140/q141),
# run after the round's uniform full-registry sweep (which predates
# them). Next round's uniform sweep folds these in.
set -u
cd "$(dirname "$0")/../.."
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
for seed in 11 222 3333 44444 55555 66666 77777 88888 1234 98765 7 424242; do
  echo "== seed $seed =="
  python3 tools/gen_fuzz_corpus.py "$seed" "/tmp/fz141_$seed" >/dev/null
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Verify "$JAR" "/tmp/fz141_$seed" "/tmp/fz141_${seed}_out" \
    q140_embedding_outliers,q141_stream_vector_ingest \
    > "/tmp/fz141_${seed}_verify.log" 2>&1 || { echo "VERIFY FAILED seed $seed"; continue; }
  GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
    "/tmp/fz141_$seed" "/tmp/fz141_${seed}_out" 2>&1 | grep -E "^(FAIL|== )"
  rm -rf "/tmp/fz141_$seed" "/tmp/fz141_${seed}_out"
done
echo Q140_Q141_SWEEP_DONE
