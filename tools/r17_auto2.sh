#!/bin/bash
# r17 follow-up: the canonical-first auto routing at the d=8 frontier —
# auto should now match forced star (the first cut paid a redundant 2x
# symmetric-closure checkpoint before routing: 483 s vs star's 236 s).
cd /root/repo
LOG=/root/repo/tools/r17_auto2.log
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
for s in auto star; do
  drain; date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25m SPARK_GRAFT_ONLY_GROUPS=1 \
    SPARK_GRAFT_MAXHAM=8 SPARK_GRAFT_CC_STRATEGY=$s \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done
echo "=== DONE ==="
date
