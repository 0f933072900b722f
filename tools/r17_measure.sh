#!/bin/bash
# r17 measurement sequence: drained sf0.1 pins first, then the scale runs.
# Direct-JVM (no sbt) per bench discipline — never compile while this runs.
# Queue targets: #2 dedup_incremental sf25 multi-set pin, #4 d=8 multi-table
# grouping slope at sf50m, #7 multimodal_audio_mp3_dedup steady pin.
cd /root/repo
LOG=/root/repo/tools/r17_measure.log
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

echo "=== step 1: sf0.1 steady re-pin (STEADY_r17.json) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STEADY_OUT=STEADY_r17.json \
  run graft.MicroBench

echo "=== step 2: focused min-of-5 pin — mp3 gate (queue #7) + simhash family + new gate ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_MICRO=multimodal_audio_mp3_dedup,dedup_simhash,dedup_simhash_multitable,dedup_simhash_groups,dedup_simhash_groups_mt,dedup_member_expand \
  SPARK_GRAFT_STEADY_OUT=tools/steady_r17_focus.json \
  run graft.MicroBench

echo "=== step 3: sf0.1 full-suite bench (BENCH_LOCAL.json) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  run graft.Bench

echo "=== step 4: dedup_incremental verbatim-sf25 multi-set pin (queue #2): 3 x warm+2, one JVM each ==="
for i in 1 2 3; do
  date; cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 SPARK_GRAFT_MICRO=dedup_incremental \
    SPARK_GRAFT_MICRO_REPS=2 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    SPARK_GRAFT_STEADY_OUT="tools/steady_sf25_r17_inc_set$i.json" \
    run graft.MicroBench
done

echo "=== step 5: IncBench verbatim sf25 (stage attribution for the spread, if it persists) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 SPARK_GRAFT_MICRO_REPS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.IncBench

echo "=== step 6: regenerate mutated sf50m fixture ==="
date; df -h / | tail -1
run graft.ScaleData /root/testdata/sf0.1 testdata_sf50m 500 mutate
df -h / | tail -1

echo "=== step 7: d=8 multi-table grouping slope (queue #4) — one clean JVM per decade ==="
for d in testdata_sf12m testdata_sf25m testdata_sf50m; do
  date; cat /proc/loadavg; df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/$d SPARK_GRAFT_ONLY_GROUPS=1 SPARK_GRAFT_MAXHAM=8 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    run graft.SimHashBandBench
done

echo "=== DONE ==="
date; df -h / | tail -1
