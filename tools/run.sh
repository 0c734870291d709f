#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# bypassing sbt startup. Usage: tools/run.sh graft.Verify <args...>
set -e
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# 24g: the 8g default produced multi-ten-second full-GC stalls in the
# heavier probes (PQ encode, 1M-row engine lifecycle) on this 128 GiB box
exec java $OPENS -Xmx24g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
