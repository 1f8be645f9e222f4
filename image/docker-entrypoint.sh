#!/bin/sh
# Launches the long-running engine server (gRPC on 2884, framed YAML on
# 2885). Spark runs in local mode inside this JVM — all request-level
# parallelism is Spark task parallelism (SPARK_GRAFT_CPUS threads).
#
# The --add-opens set matches org.apache.spark.launcher.JavaModuleOptions:
# required on JDK 17 when SparkSession is created outside spark-submit.
set -e

: "${SPARK_GRAFT_CPUS:=$(nproc)}"
: "${SPARK_DRIVER_MEM:=8g}"
# Overridable so `make image-smoke` can exercise this exact script against
# a locally-assembled jar without docker (Makefile target).
: "${ENGINE_JAR:=/opt/engine/bin/engine.spark.jar}"
: "${SPARK_JARS_DIR:=/opt/spark/jars}"
export SPARK_GRAFT_CPUS

exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Xmx"$SPARK_DRIVER_MEM" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.icu.caseMappings.enabled=false \
  -cp "$SPARK_JARS_DIR/*:$ENGINE_JAR" \
  graft.server.EngineServer "$@"
