#!/bin/bash
# Run a graft main (graft.Bench / graft.Verify / graft.ScaleUp) straight
# from the compiled classes, bypassing sbt — lets measurements run while
# sbt holds the project lock (test suite, compile). Compile first:
#   sbt -batch compile
# Env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_* knobs.
set -euo pipefail
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
