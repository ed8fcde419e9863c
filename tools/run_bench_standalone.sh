#!/bin/bash
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_JARS=$(ls ~/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13.17/scala-library-2.13.17.jar 2>/dev/null | head -1)
if [ -z "$SCALA_JARS" ]; then SCALA_JARS=$(find /root/.sbt /root/.cache -name "scala-library-2.13.17.jar" 2>/dev/null | head -1); fi
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx24g -XX:+UseParallelGC -Xmn8g \
  -cp "/root/repo/target/scala-2.13/classes:$SCALA_JARS:/opt/spark/jars/*" \
  graft.Bench
