#!/bin/bash
# r17 follow-up 2: the blocks (key-width) knob at the sf50m frontier, plus
# the sf50m grouping point re-measured on the star-first CC default.
#  - ONLY_PAIRS blocks=10/11/12: completeness is pigeonhole at any valid
#    blocks, so verified_pairs must be IDENTICAL (148.6M); what moves is
#    candidate mass (per-table collision pressure vs table count).
#    At d=8: 45x~12.8-bit vs 165x~17.5-bit vs 495x~21.3-bit tables.
#  - ONLY_GROUPS auto: the 993 s r17 slope point carried the superseded
#    minLabel-prefix default; re-pin on the canonical star-first route.
cd /root/repo
LOG=/root/repo/tools/r17_blocks.log
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
for b in 10 11 12; do
  drain; date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf50m SPARK_GRAFT_ONLY_PAIRS=1 \
    SPARK_GRAFT_MAXHAM=8 SPARK_GRAFT_BLOCKS=$b \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done
drain; date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf50m SPARK_GRAFT_ONLY_GROUPS=1 \
  SPARK_GRAFT_MAXHAM=8 SPARK_GRAFT_CC_STRATEGY=auto \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.SimHashBandBench
echo "=== DONE ==="
date
