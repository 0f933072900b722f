#!/bin/bash
# r17 follow-up 3: the SHIPPED-DEFAULT d=8 grouping at scale — blocks=0
# lets the corpus-sized occupancy rule pick (11 at these rep counts) and
# CC auto routes star-first. These are the complete-output numbers the
# superseded blocks=10 pins understate (they silently cap-dropped pairs).
cd /root/repo
LOG=/root/repo/tools/r17_defgroups.log
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
for sf in testdata_sf25m testdata_sf50m; do
  drain; date; cat /proc/loadavg; df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/$sf SPARK_GRAFT_ONLY_GROUPS=1 \
    SPARK_GRAFT_MAXHAM=8 SPARK_GRAFT_BLOCKS=0 SPARK_GRAFT_CC_STRATEGY=auto \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done
echo "=== DONE ==="
date
