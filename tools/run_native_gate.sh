#!/bin/bash
# Native-sf1.0 correctness gate (round-5 verdict #2): generate the full star
# schema NATIVELY at sf=1.0 (distinct values — graft.gen.TableGen, not
# ScaleUp replication), dump every registry query via graft.Verify, then
# replay the oracle in DuckDB — small results exact (check_oracle.py with
# ORACLE_SKIP for the huge ones), >2M-row results via the in-DuckDB multiset
# fingerprint (check_oracle_sqlhash.py). sbt-free: compiled classes +
# /opt/spark/jars directly. Budget ~1-2h (DuckDB recursive CTEs dominate).
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
SF="${1:-1.0}"
DATA="${2:-/tmp/native-sf1}"
VOUT="${3:-/tmp/vout_native_sf1}"
echo "=== tablegen sf=$SF -> $DATA ==="
$JAVA graft.gen.TableGen "$DATA" "$SF" 42
echo "=== verify ==="
export SPARK_GRAFT_CPUS=16
$JAVA graft.Verify "$DATA" "$VOUT"
echo "=== oracle (exact, skipping fingerprint-tier) ==="
# the same >2M-row tier the 10x gate fingerprints (COVERAGE.md)
BIG="kg_bgp_path_inverse,kg_bgp_planned_stats,kg_bgp_delta,kg_bgp_delta_retract,kg_owl_entailed,kg_bgp,kg_bgp_union,kg_bgp_construct,kg_bgp_filter,kg_bgp_negated,kg_view_maintained,kg_bgp_optional"
ORACLE_SKIP="$BIG" python3 /root/repo/tools/check_oracle.py "$DATA" "$VOUT"
echo "=== oracle (fingerprint tier) ==="
ORACLE_ONLY="$BIG" python3 /root/repo/tools/check_oracle_sqlhash.py "$DATA" "$VOUT"
