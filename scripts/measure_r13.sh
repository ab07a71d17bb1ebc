#!/bin/bash
# Round-13 measurement batch:
#  - sf10 replica (fresh sandbox each round)
#  - MaintainScale at sf10 under format-5 (the nuv column's marginal
#    cost vs r12's format-4: build 34.0 / no-op 1.1 / append 7.5)
#  - LayoutScale with the per-partition compaction phases
#    (append_small vs compact — the r12 verdict-#4 fix's number)
#  - the stats-planned family q169/q170/q171 REPS=5 stats-on vs
#    stats-off per scale (steady state now rides the feed-stamp
#    short-circuit; rep1 pays the injection)
#  - q172 REPS=5 prune-on vs prune-off per scale (the file-skipping
#    delta over the same clustered layout)
#  - default-location sf10 prime, then the sf10 executed-plan pins
#    (StatsJoinCboSpec / StatsStarCboSpec / StatsBroadcastSpec)
# One sbt at a time (target-dir lock). Closing gates run separately.
set -u
LOG=${1:-/tmp/measure_r13.log}
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

if [ ! -e /tmp/sf10/events.parquet ]; then
  run sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100"
fi

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.MaintainScale"

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.LayoutScale"

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r13_tbl_$(basename $SF)"
  rm -rf "$TBL"
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
    sbt -batch "runMain graft.RunOne q151_kmv_maintain spark.graft.kmv.tableDir=$TBL"
  for Q in q169_stats_join_order q170_stats_star_order q171_stats_broadcast; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL spark.graft.stats.cbo=false"
  done
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
    sbt -batch "runMain graft.RunOne q172_zorder_prune"
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
    sbt -batch "runMain graft.RunOne q172_zorder_prune spark.graft.zindex.prune=false"
done

# prime the DEFAULT-location sf10 artifacts, then the sf10
# executed-plan pins
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_REPS=1 \
  sbt -batch "runMain graft.RunOne q151_kmv_maintain"
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_REPS=1 \
  sbt -batch "runMain graft.RunOne q169_stats_join_order"
run sbt -batch "testOnly graft.StatsJoinCboSpec graft.StatsStarCboSpec graft.StatsBroadcastSpec"
echo "MEASURE_R13_DONE" >> "$LOG"
