#!/bin/bash
# Run a graft main class against the compiled sbt output without sbt's
# runner overhead: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
CLASSES=/root/repo/target/scala-2.13/classes
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS_ARGS=()
for p in "${ADD_OPENS[@]}"; do OPENS_ARGS+=(--add-opens "$p=ALL-UNNAMED"); done
# Code-cache sizing matches build.sbt javaOptions: the JDK-default
# 240 MB fills after ~90 codegen-heavy queries in one JVM and the JIT
# stops compiling (BENCH_r08: 5-15x interpreted-mode slowdowns).
exec java "${OPENS_ARGS[@]}" \
  -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$@"
