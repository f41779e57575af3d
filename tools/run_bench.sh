#!/bin/bash
# Run graft.Bench with plain java against compiled classes (no sbt lock).
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# -Xms=-Xmx + THP(madvise): without these the heap repeatedly commits/
# uncommits under G1 and every growth phase is a kernel page-fault storm
# (measured: us~5% sy~25%, task medians 10-30x, stime>>utime on every
# thread). Xms pins the floor (each page faults once, lazily); THP makes
# the one-time faults 2MB-granular. AlwaysPreTouch was tried and dropped —
# it front-loads the same faults into a ~10-min serial startup when host
# memory is fragmented.
exec java $OPENS -Xms24g -Xmx24g -XX:+UseTransparentHugePages -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${BENCH_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
