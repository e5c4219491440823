#!/bin/bash
# Full-gate sweep one decade above the driver's largest SF:
#   1. graft.ScaleUp      — FK-consistent 10x amplification of sf0.1 (~sf1)
#   2. graft.Verify       — every SparkEntry.queries entry dumped at 10x
#   3. tools/local_verify — DuckDB oracles recomputed over the SAME
#                           amplified tables, exact value compare
#   4. graft.Bench        — per-query seconds at 10x -> SCALE10X_BENCH.json
# Driver-side tooling only — NOT part of the library.
set -uo pipefail
cd "$(dirname "$0")/.."

SRC=${1:-/root/testdata/sf0.1}
AMP=${2:-/tmp/graft_scale10x}
OUT=/tmp/graft_verify10x
FACTOR=${3:-10}

sbt -batch "runMain graft.ScaleUp $SRC $AMP $FACTOR" || exit 1
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $AMP $OUT" || exit 1
python3 tools/local_verify.py "$AMP" "$OUT" | tee /tmp/scale10x_verify.log
SPARK_GRAFT_SF_DIR="$AMP" SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_BENCH.json sbt -batch "runMain graft.Bench"
