#!/bin/bash
# Run a graft main class outside sbt (same JVM flags as build.sbt's
# forked run) so data generation / bench runs don't serialize behind an
# sbt test invocation. Usage: tools/runjvm.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# label the measurement regime for Bench's runner-aware drift prior
export GRAFT_RUNNER="${GRAFT_RUNNER:-jvm}"
exec java $OPENS ${GRAFT_JVM_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
