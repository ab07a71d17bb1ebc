#!/bin/bash
# Round-10 measurement batch: anchors-off vs anchored sketch-query cost
# (fresh JVM, REPS=5, sf0.1 + sf10), new-query RunOne rows (q158-q160),
# MaintainScale re-run on the generation-based table, ApproxAb with
# min-over-reps reporting. One sbt at a time (target-dir lock).
set -u
LOG=${1:-/tmp/measure_r10.log}
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r10_tbl_$(basename $SF)"
  rm -rf "$TBL"
  # prime the maintained sketch table once per scale (the one corpus
  # scan), so per-mode reps measure the steady state both modes share
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
    sbt -batch "runMain graft.RunOne q151_kmv_maintain spark.graft.kmv.tableDir=$TBL"
  for Q in q139_kmv_distinct q146_kmv_rolling q148_kmv_algebra \
           q151_kmv_maintain q152_approx_rewrite q157_join_size_est; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL spark.graft.sketch.anchors=false"
  done
  for Q in q158_synopsis_order q159_quantile_sketch q160_stream_quantile; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
  done
done

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.MaintainScale"
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_REPS=5 \
  sbt -batch "runMain graft.ApproxAb"
echo "MEASURE_R10_DONE" >> "$LOG"
