#!/bin/bash
# Launch graft via spark-submit — the deployment path a real cluster uses
# (the north rule: "run via spark-submit on multi-executor clusters").
#
#   sbt -batch package                 # build the library jar once
#   tools/spark_submit_bench.sh graft.Bench
#   tools/spark_submit_bench.sh graft.Demo /tmp/demoS 20000
#
# In the sandbox the master is local[N]; on a cluster, swap --master for
# yarn/k8s and move the JVM flags to spark.executor.extraJavaOptions —
# they are standard executor practice (see BASELINE.md, round-2
# environment findings: -Xms=-Xmx + THP eliminate G1 page-fault storms).
set -euo pipefail

JAR=$(ls -t /root/repo/target/scala-2.13/*.jar 2>/dev/null | head -1)
[ -n "$JAR" ] || { echo "no jar — run: sbt -batch package" >&2; exit 1; }
CLASS="${1:?usage: spark_submit_bench.sh <mainClass> [args...]}"; shift

DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-16}]" \
  --class "$CLASS" \
  --driver-memory "$DRIVER_MEM" \
  --conf "spark.driver.extraJavaOptions=-Xms$DRIVER_MEM -XX:+UseTransparentHugePages -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" "$@"
