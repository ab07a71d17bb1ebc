#!/bin/bash
# Round-12 measurement batch:
#  - MaintainScale at sf10 under format-4 (the kss bundle's marginal
#    build/append cost — watch the accretion vs r11's 32.1 s build)
#  - fresh-JVM REPS=5 anchored vs anchors-off rows for q162 (the
#    table-served migration headline) and q157 (format-4 regression
#    check), per scale
#  - q169 stats-on vs stats-off (the measured CBO delta), per scale
#  - default-location sf10 table + layout prime, then the
#    StatsJoinCboSpec sf10 executed-order pin
#  - StatsStateScale (q167/q160 aggregates) at fanout 1 and 100
#  - closing full gate: sbt test, Verify sf0.01 + preflight, Bench
# One sbt at a time (target-dir lock).
set -u
LOG=${1:-/tmp/measure_r12.log}
: > "$LOG"
run() { echo "=== $* ===" >> "$LOG"; "$@" >> "$LOG" 2>&1; }

if [ ! -e /tmp/sf10/events.parquet ]; then
  run sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100"
fi

run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.MaintainScale"

for SF in /root/testdata/sf0.1 /tmp/sf10; do
  TBL="/tmp/graft_r12_tbl_$(basename $SF)"
  rm -rf "$TBL"
  # prime the maintained table once per scale (the one corpus scan), so
  # per-mode reps measure the steady state both modes share
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=1 \
    sbt -batch "runMain graft.RunOne q151_kmv_maintain spark.graft.kmv.tableDir=$TBL"
  for Q in q162_selfjoin_moment q157_join_size_est; do
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL"
    run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
      sbt -batch "runMain graft.RunOne $Q spark.graft.kmv.tableDir=$TBL spark.graft.sketch.anchors=false"
  done
  # q169: stats-driven plan vs literal order (first rep pays the typed
  # layout build; REPS=5 last-rep-wins isolates steady state)
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
    sbt -batch "runMain graft.RunOne q169_stats_join_order spark.graft.kmv.tableDir=$TBL"
  run env SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=5 \
    sbt -batch "runMain graft.RunOne q169_stats_join_order spark.graft.kmv.tableDir=$TBL spark.graft.stats.cbo=false"
done

# prime the DEFAULT-location sf10 table (migrates the r11 format-3
# survivor) + typed layout, then the sf10 executed-order pin
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_REPS=1 \
  sbt -batch "runMain graft.RunOne q151_kmv_maintain"
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_REPS=1 \
  sbt -batch "runMain graft.RunOne q169_stats_join_order"
run sbt -batch "testOnly graft.StatsJoinCboSpec"

# streaming statistics aggregates: state rows == groups at 1x and 100x
# group cardinality on RocksDB (complete = no-eviction ceiling), plus
# the production append-mode eviction plateau at 100x
for AGG in kmvfreq quantile; do
  run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.StatsStateScale $AGG 1"
  run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.StatsStateScale $AGG 100"
  run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.StatsStateScale $AGG 100 append"
done

# the typed layout's incremental-maintenance cost profile at sf10
run env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.LayoutScale"

# closing gate
run sbt -batch test
run env SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r12"
run python3 scripts/preflight.py /tmp/verify_r12 /root/testdata/sf0.01
run env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
echo "MEASURE_R12_DONE" >> "$LOG"
