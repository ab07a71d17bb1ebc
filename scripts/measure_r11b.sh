#!/bin/bash
# Round-11 late-addition measurements: q163 (quantile drift) and q164
# (range selectivity) served from the maintained sketch table —
# fresh-JVM REPS=5 anchored/off at sf0.1 and the sf10 replica, against
# the per-scale primed tables (regenerated if missing).
set -euo pipefail
LOG="${1:-/tmp/measure_r11b.log}"
cd "$(dirname "$0")/.."
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

if [ ! -d /tmp/sf10 ]; then
  run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    bash scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100
fi

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r11_tbl_$(basename $SF)"
  if [ ! -d "$TBL" ]; then
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
      bash scripts/run_main.sh graft.RunOne q151_kmv_maintain \
      spark.graft.kmv.tableDir=$TBL
  fi
  for Q in q163_quantile_drift q164_range_selectivity; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL \
      spark.graft.sketch.anchors=false
  done
done
echo "MEASURE_R11B_DONE" >> "$LOG"
