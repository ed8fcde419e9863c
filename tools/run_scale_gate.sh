#!/bin/bash
set -e
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_JAR=$(find /root/.cache -name "scala-library-2.13.17.jar" | head -1)
CP="/root/repo/target/scala-2.13/classes:$SCALA_JAR:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:+UseParallelGC -Xmn8g -cp $CP"
echo "=== scaleup ==="
$JAVA graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sfx10 10
echo "=== verify ==="
export SPARK_GRAFT_CPUS=16
$JAVA graft.Verify /tmp/sfx10 /tmp/vout_sfx10
echo "=== oracle ==="
python3 /root/repo/tools/check_oracle.py /tmp/sfx10 /tmp/vout_sfx10
