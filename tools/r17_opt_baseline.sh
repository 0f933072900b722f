#!/bin/bash
# Optimization-round baseline: verify green + capture before-numbers.
# Run AFTER sbt test completes (sbt build lock).
set -x
cd /root/repo

# 1. Correctness at sf0.01 vs the DuckDB oracle
rm -rf /tmp/verify_out
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out" \
  > /tmp/r17_verify.log 2>&1
echo "VERIFY_EXIT=$?"
python3 tools/check_oracle.py > /tmp/r17_oracle.log 2>&1
echo "ORACLE_EXIT=$?"
tail -5 /tmp/r17_oracle.log

# 2. Bench baseline at sf0.1 (driver methodology), drained start
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_bench_before.json \
  SPARK_GRAFT_BENCH_SUMMARY_OUT=/tmp/r17_bench_before_summary.json \
  sbt -batch "runMain graft.Bench" > /tmp/r17_bench_before.log 2>&1
echo "BENCH_EXIT=$?"

# 3. Before-plans for every gate
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PLAN_OUT=/root/repo/plans/r17 SPARK_GRAFT_PLAN_SUFFIX=_before \
  sbt -batch "runMain graft.PlanDump" > /tmp/r17_plandump.log 2>&1
echo "PLANDUMP_EXIT=$?"
