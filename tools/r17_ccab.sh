#!/bin/bash
# r17 CC-strategy A/B at the aggressive-distance frontier: d=8 multi-table
# grouping at mutated sf25m, strategy auto vs minLabel vs star, one clean
# JVM each, drain-spaced. The CC tail owns most of this wall (BASELINE r17
# slope attribution) — this decides whether the auto handoff is already the
# right default there.
cd /root/repo
LOG=/root/repo/tools/r17_ccab.log
exec > "$LOG" 2>&1
set -x

CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { java -cp "$CP" $AO -Xmx100g "$@"; }

drain() {
  for _ in $(seq 1 36); do
    L=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
    [ "$L" -lt 2 ] && return
    sleep 10
  done
}

for s in auto minLabel star; do
  drain; date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25m SPARK_GRAFT_ONLY_GROUPS=1 \
    SPARK_GRAFT_MAXHAM=8 SPARK_GRAFT_CC_STRATEGY=$s \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done
echo "=== DONE ==="
date
