#!/bin/sh
# Twelve-seed oracle fuzz sweep restricted to the queries r19
# restructured (q60/q60b/q61/q93/q49/q156) — the cheap robustness gate
# for tie-break / float-fold / empty-group edge cases the sf corpora
# may not exercise. Same seeds and checker as the uniform sweep.
#
#   sbt -batch package
#   sh tools/r19/fuzz_touched.sh > evidence/r19/fuzz_touched.log 2>&1
set -u
cd "$(dirname "$0")/../.."
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
Q=q60_ann_pq,q60b_ann_pq_trained,q61_range_join,q49_topterms,q156_cell_repair
for seed in 11 222 3333 44444 55555 66666 77777 88888 1234 98765 7 424242; do
  echo "== seed $seed =="
  python3 tools/gen_fuzz_corpus.py "$seed" "/tmp/fuzz_r19_$seed"
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Verify "$JAR" \
    "/tmp/fuzz_r19_$seed" "/tmp/fuzz_r19_${seed}_out" "$Q" \
    > "/tmp/fuzz_r19_${seed}_verify.log" 2>&1 || { echo "VERIFY FAILED seed $seed"; continue; }
  GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
    "/tmp/fuzz_r19_$seed" "/tmp/fuzz_r19_${seed}_out" 2>&1 | \
    grep -E "^(FAIL|== )"
  rm -rf "/tmp/fuzz_r19_$seed" "/tmp/fuzz_r19_${seed}_out"
done
echo TOUCHED_SWEEP_DONE
