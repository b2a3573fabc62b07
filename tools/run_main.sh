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
# `sbt compile` alone does not copy src/main/resources into the classes
# dir; without META-INF/services the freqstore DSv2 sources silently
# fail to register (r20: this produced fast-fail bench lines that looked
# like timings). sbt runMain (the driver path) is unaffected.
if [ ! -f target/scala-2.13/classes/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister ]; then
  echo "[run_main] META-INF/services missing from classes - run 'sbt Compile/copyResources' first" >&2
  exit 3
fi
# EXTRA_JAVA_OPTS: ad-hoc -D flags (e.g. spark confs picked up at session
# build) for A/B experiments without editing the harness mains.
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" ${EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "graft.$MAIN" "$@"
