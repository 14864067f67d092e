#!/bin/sh
# Round-15 witness battery for the session's additions (q147 filtered
# ANN, q148 index stats, q149 streaming curation):
#   1. AnnRecall at the 20k and 80k corpora — adds recall5_ann_filtered
#      and the filtered probe-width band to the §9.1 curve.
#   2. Oracle gate at scale: q147/q148 at the 80k corpus, q149 at the
#      50k-doc corpus (the decontam-oracle scale precedent).
#   3. Warm per-query seconds via the Bench subset runner at both
#      corpora (the lifecycle-table format, §10.1).
#
#   sbt -batch package
#   sh tools/r15/witness_q147_q149.sh > evidence/r15/witness_q147_q149.log 2>&1
set -u
cd "$(dirname "$0")/../.."
JAR=target/scala-2.13/duckdb_gsheetsspark_2.13-0.1.0.jar
SUBMIT="/opt/spark/bin/spark-submit --master local[32] --driver-memory 16g"

echo "== AnnRecall 20k =="
$SUBMIT --class graft.AnnRecall "$JAR" /tmp/scale_10x_r13 \
  evidence/r15/ann_recall_10x_r15b.json 2>/dev/null | tail -1
echo "== AnnRecall 80k =="
$SUBMIT --class graft.AnnRecall "$JAR" /tmp/scale_40x_r13 \
  evidence/r15/ann_recall_40x_r15b.json 2>/dev/null | tail -1

echo "== oracle gate: q147+q148 at 80k vectors =="
$SUBMIT --class graft.Verify "$JAR" /tmp/scale_40x_r13 /tmp/wit147_40x \
  q147_ann_filtered,q148_ivf_index_stats > /tmp/wit147_40x.log 2>&1
GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
  /tmp/scale_40x_r13 /tmp/wit147_40x 2>&1 | grep -E "^(FAIL|PASS|== )"

echo "== oracle gate: q149 at 50k docs =="
$SUBMIT --class graft.Verify "$JAR" /tmp/scale_10x_r13 /tmp/wit149_10x \
  q149_stream_curate > /tmp/wit149_10x.log 2>&1
GRAFT_ORACLE_MEM_GB=32 python3 tools/check_correctness.py \
  /tmp/scale_10x_r13 /tmp/wit149_10x 2>&1 | grep -E "^(FAIL|PASS|== )"

echo "== bench subset at 20k/50k =="
SPARK_GRAFT_SF_DIR=/tmp/scale_10x_r13 \
  SPARK_GRAFT_BENCH_ONLY=q147_ann_filtered,q148_ivf_index_stats,q149_stream_curate \
  SPARK_GRAFT_BENCH_OUT=evidence/r15/bench_new_10x.json \
  $SUBMIT --class graft.Bench "$JAR" 2>/dev/null | grep '"metric"'
echo "== bench subset at 80k/200k =="
SPARK_GRAFT_SF_DIR=/tmp/scale_40x_r13 \
  SPARK_GRAFT_BENCH_ONLY=q147_ann_filtered,q148_ivf_index_stats,q149_stream_curate \
  SPARK_GRAFT_BENCH_OUT=evidence/r15/bench_new_40x.json \
  $SUBMIT --class graft.Bench "$JAR" 2>/dev/null | grep '"metric"'
echo WITNESS_DONE
