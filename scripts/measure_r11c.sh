#!/bin/bash
# Round-11 statistics-bundle measurements: the maintenance pass now
# also builds the per-partition stats bundle (kv/n/vmin/vmax), so
# MaintainScale is re-run for the honest cost delta; q165 (the ANALYZE
# surface off the table) gets fresh-JVM REPS=5 anchored/off rows at
# sf0.1 and the sf10 replica; the closing two-lane bench includes it.
# Old primed tables are format-1 (pre-bundle) — deleted so the
# migrating rebuild is not attributed to a query's first rep.
set -euo pipefail
LOG="${1:-/tmp/measure_r11c.log}"
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
  for Q in q165_table_stats; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      bash scripts/run_main.sh graft.RunOne $Q spark.graft.kmv.tableDir=$TBL \
      spark.graft.sketch.anchors=false
  done
done

# closing two-lane bench at the driver's scale (q165 joins the batch lane)
run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  bash scripts/run_main.sh graft.Bench
echo "MEASURE_R11C_DONE" >> "$LOG"
