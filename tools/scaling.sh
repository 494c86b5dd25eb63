#!/bin/bash
# Scaling bench orchestrator: interleaved levels, one fresh JVM per run
# (noisy shared host -> min-of-reps per level is the robust statistic).
# Usage: tools/scaling.sh [nConvs] [reps]
set -e
cd /root/repo
CONVS=${1:-200000}
REPS=${2:-3}
OUT=/tmp/scaling_results.jsonl
: > $OUT
for REP in $(seq 1 $REPS); do
  for LVL in 4 16 8 32; do
    echo "[scaling] rep $REP level $LVL..." >&2
    GRAFT_XMX=24g SPARK_GRAFT_BENCH_LEVEL=$LVL SPARK_GRAFT_BENCH_CONVS=$CONVS \
      SPARK_GRAFT_BENCH_REPS=1 MAIN=graft.ScalingBench \
      tools/run_verify.sh x y 2>/dev/null | grep -E '^\{' >> $OUT
  done
done
python3 tools/scaling_report.py $OUT $CONVS $REPS
