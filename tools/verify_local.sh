#!/bin/bash
# Local oracle self-check for a comma-separated query list (or all when
# no list given): compile first (sbt -batch compile), then
#   tools/verify_local.sh [q229_kcore,q230_...] [sfDir] [outDir]
# Driver-side tooling only — mirrors the driver's Verify + DuckDB compare.
set -e
ONLY="${1:-}"
SF="${2:-/root/testdata/sf0.001}"
OUT="${3:-/tmp/verify_local}"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>&1 | tail -1
python3 tools/check_oracle.py "$SF" "$OUT"
