#!/bin/sh
# Run a graft main class on plain `java` (no sbt lock): lets the sf1
# gate's Spark dumps, the DuckDB compare, and an sbt test session
# coexist. Compile first (sbt compile); this only launches.
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_verify
set -eu
BIN_DIR=$(CDPATH= cd -- "$(dirname -- "$0")" && pwd)
REPO_DIR=$(dirname -- "$BIN_DIR")
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
CLASSES="$REPO_DIR/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 2; }
MAIN="$1"; shift
exec java \
  -Xmx"${GRAFT_XMX:-96g}" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CLASSES:$SPARK_JARS/*" \
  "$MAIN" "$@"
