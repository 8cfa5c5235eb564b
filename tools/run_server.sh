#!/bin/bash
# Launch the server with a bare JVM (faster than sbt, same flags).
# Spark 4.x on JDK 17 needs the module opens spark-submit/sbt inject —
# without java.base/sun.util.calendar, DATE columns fail to decode at
# the wire layer (SparkDateTimeUtils reflects into ZoneInfo).
# Usage: bash tools/run_server.sh [pgPort] [chPort] [sfDir] [extra flags...]
set -u
cd "$(dirname "$0")/.."
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.server.ServerMain "$@"
