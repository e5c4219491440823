#!/bin/bash
# Full-gate sweep one decade above the driver's largest SF:
#   1. graft.ScaleUp      — FK-consistent 10x amplification of sf0.1 (~sf1)
#   2. graft.Verify       — every SparkEntry.queries entry dumped at 10x
#   3. tools/local_verify — DuckDB oracles recomputed over the SAME
#                           amplified tables, exact value compare, PLUS
#                           the row-count-ratio guard against the 1x
#                           counts (a recall collapse fails; 0==0 does
#                           not vacuously pass)
#   4. graft.Bench        — per-query seconds at 10x -> SCALE10X_BENCH.json
#   5. tools/scale10x_summary.py -> SCALE10X.json (committed artifact)
# Core count matches BENCH_full (default 32) so 10x/1x wall ratios
# measure DATA scaling, not a core handicap; override SPARK_GRAFT_CPUS.
# Driver-side tooling only — NOT part of the library.
set -uo pipefail
cd "$(dirname "$0")/.."

SRC=${1:-/root/testdata/sf0.1}
AMP=${2:-/tmp/graft_scale10x}
OUT=/tmp/graft_verify10x
FACTOR=${3:-10}
BASE=${SCALE10X_BASELINE_DIR:-/tmp/graft_verify01}
CPUS=${SPARK_GRAFT_CPUS:-32}
# 32 concurrent tasks over 10x data need headroom beyond the 8g dev
# default (per-task sort/agg buffers scale with parallelism)
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g}

# ratio baseline: per-entry row counts from a 1x run of the same gate.
# A broken baseline must ABORT — it would otherwise silently become the
# ratio denominator for the 10x run (pipefail propagates through tee).
if [ ! -f "$BASE/counts.json" ]; then
  echo "[scale10x] no 1x counts at $BASE — generating baseline run"
  SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SRC $BASE" || exit 1
  if ! python3 tools/local_verify.py "$SRC" "$BASE" | tee /tmp/scale10x_baseline.log; then
    echo "[scale10x] 1x baseline verify FAILED — aborting (see /tmp/scale10x_baseline.log)"
    exit 1
  fi
fi

SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.ScaleUp $SRC $AMP $FACTOR" || exit 1
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $AMP $OUT" || exit 1
python3 tools/local_verify.py "$AMP" "$OUT" --baseline "$BASE/counts.json" \
  --factor "$FACTOR" | tee /tmp/scale10x_verify.log
SPARK_GRAFT_SF_DIR="$AMP" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_BENCH.json sbt -batch "runMain graft.Bench"
python3 tools/scale10x_summary.py /tmp/scale10x_verify.log
