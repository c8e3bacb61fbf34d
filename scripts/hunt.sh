#!/usr/bin/env bash
# Epoch hunter: loop gated ScalingHunt probes (marginal 8->32 mode by
# default) against the pre-generated data/gen bench tables, appending one
# JSON line per probe to the log. Runs the compiled classes directly so a
# probe costs no sbt startup.
#   usage: scripts/hunt.sh <n_probes> <logfile> [extra env via environment]
set -u
cd "$(dirname "$0")/.."
N=${1:-20}
LOG=${2:-/tmp/hunt.log}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM=${SPARK_DRIVER_MEM:-16g}
for i in $(seq 1 "$N"); do
  echo "probe $i/$N $(date -u +%H:%M:%S)" >> "$LOG"
  SPARK_GRAFT_MARGINAL=${SPARK_GRAFT_MARGINAL:-1} \
  java $OPENS -Xms"$MEM" -Xmx"$MEM" -XX:+AlwaysPreTouch \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScalingHunt 2>>"$LOG.err" | grep -E '^\{' >> "$LOG"
done
echo "done $(date -u +%H:%M:%S)" >> "$LOG"
