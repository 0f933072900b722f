#!/bin/bash
# r16 measurement sequence: drained sf0.1 pins first, then the scale runs.
# Direct-JVM (no sbt) per bench discipline — never compile while this runs.
cd /root/repo
LOG=/root/repo/tools/r16_measure.log
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

echo "=== step 1: sf0.1 steady re-pin (STEADY_r16.json) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STEADY_OUT=STEADY_r16.json \
  run graft.MicroBench

echo "=== step 2: sf0.1 full-suite bench (BENCH_LOCAL.json) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  run graft.Bench

echo "=== step 3: regenerate mutated sf50m fixture ==="
date; df -h / | tail -1
run graft.ScaleData /root/testdata/sf0.1 testdata_sf50m 500 mutate
df -h / | tail -1

echo "=== step 4: band-knob A/B at sf25m (bands 32 vs 16) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25m SPARK_GRAFT_BANDS=32,16 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.BandKnobBench

echo "=== step 5: band-knob escape hatch at sf50m (bands 16 only) ==="
date; df -h / | tail -1
AVAIL=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
if [ "$AVAIL" -lt 25 ]; then echo "SKIP sf50m: only ${AVAIL}G free"; else
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf50m SPARK_GRAFT_BANDS=16 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.BandKnobBench
fi
df -h / | tail -1

echo "=== step 6a: IncBench verbatim sf25 (index-build clique tax) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 SPARK_GRAFT_MICRO_REPS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.IncBench

echo "=== step 6b: IncBench mutated sf25m ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25m SPARK_GRAFT_MICRO_REPS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  run graft.IncBench

echo "=== step 7: sf25m cold pins, one JVM per gate ==="
for g in dedup_incremental dedup_minhash dedup_groups dedup_keep_best dedup_simhash_groups; do
  date; cat /proc/loadavg; df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25m SPARK_GRAFT_MICRO="$g" \
    SPARK_GRAFT_MICRO_WARMUP=0 SPARK_GRAFT_MICRO_REPS=1 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
    SPARK_GRAFT_STEADY_OUT="tools/steady_sf25m_cold_r16_$g.json" \
    run graft.MicroBench
done

echo "=== step 8: verbatim sf25 warm+2 re-pin (STEADY_SF25_r16.json) ==="
date; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf25 \
  SPARK_GRAFT_MICRO=dedup_minhash,dedup_groups,dedup_keep_best,dedup_incremental,dedup_ingest_bloom,dedup_simhash_groups,dedup_containment \
  SPARK_GRAFT_MICRO_REPS=2 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=160 SPARK_GRAFT_GC_INTERVAL=5min \
  SPARK_GRAFT_STEADY_OUT=STEADY_SF25_r16.json \
  run graft.MicroBench

echo "=== DONE ==="
date; df -h / | tail -1
