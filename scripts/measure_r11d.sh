#!/bin/bash
# Round-11 key-tier measurements: the maintenance scan now builds the
# frequency-KMV (ksf) and key bundle (nu/umin/umax) — MaintainScale
# re-run for the honest delta; q166 (the join-synopsis ANALYZE surface)
# fresh-JVM REPS=5 anchored/off at sf0.1 and sf10; closing bench.
# Old primed tables are format-2 — deleted so the migrating rebuild is
# not attributed to a query's first rep.
set -euo pipefail
LOG="${1:-/tmp/measure_r11d.log}"
cd "$(dirname "$0")/.."
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

if [ ! -d /tmp/sf10 ]; then
  run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    bash scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100
fi

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  bash scripts/run_main.sh graft.MaintainScale

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r11_tbl_$(basename $SF)"
  rm -rf "$TBL"
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
    bash scripts/run_main.sh graft.RunOne q151_kmv_maintain \
    spark.graft.kmv.tableDir=$TBL
  for Q in q166_key_stats; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL \
      spark.graft.sketch.anchors=false
  done
done

# closing two-lane bench at the driver's scale (q166 joins the batch
# lane). Clear the DEFAULT tableDir first so the bench's priced
# prewarm_kmv_table key reports a clean fresh build, not a
# format-migration of whatever an earlier round left in /tmp.
rm -rf /tmp/graft_kmv_table
run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  bash scripts/run_main.sh graft.Bench
echo "MEASURE_R11D_DONE" >> "$LOG"
