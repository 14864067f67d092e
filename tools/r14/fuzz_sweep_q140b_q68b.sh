#!/bin/sh
# Twelve-seed oracle sweep for the late-round-14 additions (q140b/q68b
# — the last two trained-codebook twins — and q143, the CDC index
# maintenance op; all landed after the round's uniform full-registry
# sweep). Round 15's uniform sweep folds these in
# (the r13 q140/q141 precedent).
set -u
cd "$(dirname "$0")/../.."
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
for seed in 11 222 3333 44444 55555 66666 77777 88888 1234 98765 7 424242; do
  echo "== seed $seed =="
  python3 tools/gen_fuzz_corpus.py "$seed" "/tmp/fzb_$seed" >/dev/null
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Verify "$JAR" "/tmp/fzb_$seed" "/tmp/fzb_${seed}_out" \
    q140b_outliers_trained,q68b_semantic_dedup_trained,q143_index_delta_maintain \
    > "/tmp/fzb_${seed}_verify.log" 2>&1 || { echo "VERIFY FAILED seed $seed"; continue; }
  GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
    "/tmp/fzb_$seed" "/tmp/fzb_${seed}_out" 2>&1 | grep -E "^(FAIL|== )"
  rm -rf "/tmp/fzb_$seed" "/tmp/fzb_${seed}_out"
done
echo LATE_SWEEP_DONE
