#!/bin/bash
# Round-11 measurement batch: the manifest-generation table's cost
# profile (MaintainScale headline: no-op/append back to ~r9 levels),
# fresh-JVM REPS=5 anchored vs anchors-off rows for the queries whose
# table path changed (q146/q151/q161), the salted q162, and the full
# two-lane bench. One sbt at a time (target-dir lock).
set -u
LOG=${1:-/tmp/measure_r11.log}
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.MaintainScale"

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r11_tbl_$(basename $SF)"
  rm -rf "$TBL"
  # prime the maintained table once per scale (the one corpus scan), so
  # per-mode reps measure the steady state both modes share
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
    sbt -batch "runMain graft.RunOne q151_kmv_maintain spark.graft.kmv.tableDir=$TBL"
  for Q in q146_kmv_rolling q151_kmv_maintain q161_quantile_rolling; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL spark.graft.sketch.anchors=false"
  done
  for Q in q162_selfjoin_moment; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL spark.graft.sketch.anchors=false"
  done
done

# full two-lane bench at the driver's scale (new totals-only summary
# line + isolated streaming reruns land in the JSON)
run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
echo "MEASURE_R11_DONE" >> "$LOG"
