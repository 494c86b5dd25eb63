#!/bin/bash
# Scaling bench orchestrator: one fresh JVM per parallelism level;
# warmup + reps run inside one SparkSession per JVM (fresh sessions
# reset JIT profiles via new classloaders). 8g heap — large heaps make
# G1 pathological for this allocation profile (measured 100s+ at 24g
# vs 2s at 8g, level 16). Usage: tools/scaling.sh [nConvs] [reps]
set -e
cd /root/repo
CONVS=${1:-30000}
REPS=${2:-4}
OUT=/tmp/scaling_results.jsonl
: > $OUT
for LVL in 4 8 16 32; do
  echo "[scaling] level $LVL..." >&2
  GRAFT_XMX=8g SPARK_GRAFT_BENCH_LEVEL=$LVL SPARK_GRAFT_BENCH_CONVS=$CONVS SPARK_GRAFT_BENCH_PARASCALE=${PARASCALE:-16} \
    SPARK_GRAFT_BENCH_REPS=$REPS MAIN=graft.ScalingBench \
    tools/run_verify.sh x y 2>/dev/null | grep -E '^\{' >> $OUT
done
python3 tools/scaling_report.py $OUT $CONVS $REPS
