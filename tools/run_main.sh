#!/bin/bash
# Launch a graft main directly against the compiled classes + Spark jars,
# bypassing sbt (whose project lock serializes long jobs). Mirrors the
# forked-run JVM flags in build.sbt. Usage:
#   tools/run_main.sh [-Xmx12g] graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="-Xmx${SPARK_DRIVER_MEM:-8g}"
if [[ "${1:-}" == -Xmx* ]]; then XMX="$1"; shift; fi
OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.icu.caseMappings.enabled=false \
  "$XMX" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
