#!/bin/bash
# Run a graft main class directly on the compiled classpath (fast path,
# bypasses sbt startup; stdin works). Usage: tools/run.sh graft.Main args...
# Rebuild first with: sbt -batch compile ; refresh classpath with:
#   sbt -batch 'export Runtime/fullClasspath' | grep -E '^/' | tail -1 > /tmp/graft_cp.txt
set -e
CP_FILE=/tmp/graft_cp.txt
if [ ! -f "$CP_FILE" ]; then
  (cd "$(dirname "$0")/.." && sbt -batch 'export Runtime/fullClasspath' 2>/dev/null | grep -E '^/' | tail -1 > "$CP_FILE")
fi
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$(cat "$CP_FILE")" "$@"
