#!/bin/sh
# Twelve-seed oracle fuzz sweep at one HEAD (the per-round uniform
# sweep). Per seed: generate a schema-identical 500-doc corpus, run the
# whole Verify registry via spark-submit against the packaged jar,
# oracle-compare with the DuckDB checker.
#
#   sbt -batch package
#   sh tools/r18/fuzz_sweep.sh > evidence/r18/fuzz_sweep.log 2>&1
#
# Expected per seed: "== N pass, 0 fail ==" where N is the current
# oracle-checked registry size (170 at the r18 sweep: the full 172
# registry — including the round-18 q161 state-triggered flush —
# minus q17b/q44, spec-bounded approximations with no oracle entry by
# design).
set -u
cd "$(dirname "$0")/../.."
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
for seed in 11 222 3333 44444 55555 66666 77777 88888 1234 98765 7 424242; do
  echo "== seed $seed =="
  python3 tools/gen_fuzz_corpus.py "$seed" "/tmp/fuzz_r18_$seed"
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --class graft.Verify "$JAR" \
    "/tmp/fuzz_r18_$seed" "/tmp/fuzz_r18_${seed}_out" \
    > "/tmp/fuzz_r18_${seed}_verify.log" 2>&1 || { echo "VERIFY FAILED seed $seed"; continue; }
  GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
    "/tmp/fuzz_r18_$seed" "/tmp/fuzz_r18_${seed}_out" 2>&1 | \
    grep -E "^(FAIL|== )"
  rm -rf "/tmp/fuzz_r18_$seed" "/tmp/fuzz_r18_${seed}_out"
done
echo FINAL_SWEEP_DONE
