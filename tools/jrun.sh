#!/bin/bash
# Direct-JVM runner for graft mains (skips sbt startup; requires a prior
# `sbt compile`). Usage: tools/jrun.sh <mainClass> [args...]
# Env: JRUN_XMX (default 8g), extra -D flags via JRUN_OPTS.
set -euo pipefail
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${JRUN_XMX:-8g}" ${JRUN_OPTS:-} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
