#!/bin/bash
# r17 follow-up: (a) SPACED dedup_incremental sf25 sets — each set starts at
# drained 1-min load so the stamps are clean; (b) IncBench REPS=3 for stage
# variance attribution; (c) verified rep-pair counts per mutated decade —
# the slope attribution for the superlinear sf50m grouping point.
cd /root/repo
LOG=/root/repo/tools/r17_measure2.log
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

drain() { # wait for 1-min load < 2 (max 6 min)
  for _ in $(seq 1 36); do
    L=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
    [ "$L" -lt 2 ] && return
    sleep 10
  done
}

echo "=== step A: spaced dedup_incremental verbatim-sf25 sets (drained starts) ==="
for i in 4 5 6; do
  drain; date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 SPARK_GRAFT_MICRO=dedup_incremental \
    SPARK_GRAFT_MICRO_REPS=2 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    SPARK_GRAFT_STEADY_OUT="tools/steady_sf25_r17_inc_set$i.json" \
    run graft.MicroBench
done

echo "=== step B: IncBench REPS=3 — per-stage spread names the variant stage ==="
drain; date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 SPARK_GRAFT_MICRO_REPS=3 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.IncBench

echo "=== step C: verified rep-pair counts per mutated decade (slope attribution) ==="
for d in testdata_sf12m testdata_sf25m testdata_sf50m; do
  drain; date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/$d SPARK_GRAFT_ONLY_PAIRS=1 SPARK_GRAFT_MAXHAM=8 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done

echo "=== DONE ==="
date; df -h / | tail -1
