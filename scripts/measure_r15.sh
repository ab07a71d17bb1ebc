#!/bin/bash
# Round-15 measurement batch (one sbt at a time — target-dir lock):
#  - q173 streaming-enrich wall ladder on the sf300 events replica
#    (r14 verdict #6): arm A = honest dim statistics -> per-batch
#    BroadcastHashJoin; arm B = broadcast denied (threshold -1) ->
#    per-batch shuffle join. Fresh-JVM min-of-3 each, stage metrics.
#  - q170 star ladder re-run at sf300 (r14 verdict #3's second half)
#    stats-on vs stats-off, fresh-JVM min-of-3, stage metrics.
set -u
LOG=${1:-/tmp/measure_r15.log}
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

EV=/tmp/graft_sf300ev     # events.parquet -> sf300 replica; customer -> sf0.1
SF=/tmp/graft_sf300       # events-only replica (q170)
TBL=/tmp/graft_r15_tbl_sf300
rm -rf "$TBL"

# q173 ladder: broadcast (honest stats) vs shuffle (broadcast denied)
for i in 1 2 3; do
  run env SPARK_GRAFT_SF_DIR=$EV SPARK_GRAFT_REPS=1 SPARK_GRAFT_STAGE_METRICS=1 \
    sbt -batch "runMain graft.RunOne q173_stream_stats_enrich"
done
for i in 1 2 3; do
  run env SPARK_GRAFT_SF_DIR=$EV SPARK_GRAFT_REPS=1 SPARK_GRAFT_STAGE_METRICS=1 \
    sbt -batch "runMain graft.RunOne q173_stream_stats_enrich spark.sql.autoBroadcastJoinThreshold=-1"
done

# q170 star ladder: prewarm the sketch table, then min-of-3 per arm
run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
  sbt -batch "runMain graft.RunOne q151_kmv_maintain spark.graft.kmv.tableDir=$TBL"
for i in 1 2 3; do
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 SPARK_GRAFT_STAGE_METRICS=1 \
    sbt -batch "runMain graft.RunOne q170_stats_star_order spark.graft.kmv.tableDir=$TBL"
done
for i in 1 2 3; do
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 SPARK_GRAFT_STAGE_METRICS=1 \
    sbt -batch "runMain graft.RunOne q170_stats_star_order spark.graft.kmv.tableDir=$TBL spark.graft.stats.cbo=false"
done
echo "=== done ===" >> "$LOG"
