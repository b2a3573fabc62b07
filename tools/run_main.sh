#!/bin/bash
# Run a graft main class directly against the compiled classes, bypassing
# sbt's ~25 s startup and its project lock (lets a Verify/Bench run ride
# alongside an sbt test invocation). Mirrors build.sbt's fork options.
# Usage: tools/run_main.sh <MainClass> [args...]   (env: SPARK_DRIVER_MEM)
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# EXTRA_JAVA_OPTS: ad-hoc -D flags (e.g. spark confs picked up at session
# build) for A/B experiments without editing the harness mains.
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" ${EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "graft.$MAIN" "$@"
