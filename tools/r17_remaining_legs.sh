#!/bin/bash
# Round-17 one-off: the reordered remainder of tools/scale10x.sh.
# The 10x DuckDB verify (PID $1) is already running; everything after
# it is re-sequenced so the artifact's highest-value rows land FIRST:
#   1. SnmRecall at 1x and 10x   (the snm_recall block — never yet committed)
#   2. full 252-entry bench at 10x (q_interp_nearest's decade row)
#   3. SNM-family isolated benches (1x / 10x / 10x byteneutral)
#   4. byte-neutral text legs
# tools/scale10x_summary.py re-assembles SCALE10X.json after EVERY
# leg, so an interrupted run still leaves a committable artifact.
# Legs do NOT abort the sequence on failure (unlike scale10x.sh's
# `|| exit 1`) — a crashed leg is logged and the rest still land.
set -u
cd "$(dirname "$0")/.."

VERIFY_PID=${1:?pid of running local_verify.py}
SRC=/root/testdata/sf0.1
AMP=/tmp/graft_scale10x
AMPBN=/tmp/graft_scale10x_bn
CPUS=32
export SPARK_DRIVER_MEM=64g

log() { echo "[r17legs $(date -u +%H:%M:%S)] $*"; }

# stale SNM artifacts must not leak into the summary (mirrors
# scale10x.sh); done BEFORE the recall runs write fresh files
rm -f /tmp/graft_snm_*.json SCALE10X_TEXT.json SCALE10X_TEXT_1X.json

log "waiting for 10x verify (pid $VERIFY_PID)"
while kill -0 "$VERIFY_PID" 2>/dev/null; do sleep 30; done
log "10x verify finished"
sleep 5  # let tee flush

summarize() { python3 tools/scale10x_summary.py /tmp/scale10x_verify.log || true; }

# ---- leg 1: SNM recall, 1x then 10x -------------------------------------
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $SRC /tmp/graft_snm_recall_1x.json" \
  || log "FAILED SnmRecall 1x"
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $AMP /tmp/graft_snm_recall_10x.json" \
  || log "FAILED SnmRecall 10x"
summarize
log "leg 1 (recall) done"

# ---- leg 2: full 10x bench (fresh SCALE10X_BENCH.json, 252 entries) -----
SPARK_GRAFT_SF_DIR="$AMP" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_BENCH.json sbt -batch "runMain graft.Bench" \
  || log "FAILED full 10x bench"
summarize
log "leg 2 (full bench) done"

# ---- leg 3: SNM isolated benches ----------------------------------------
# byteneutral corpus first (also needed by leg 4)
if [ ! -d "$AMPBN/lineitem.parquet" ]; then
  SPARK_GRAFT_SCALEUP_TEXT=byteneutral SPARK_GRAFT_CPUS=$CPUS \
    sbt -batch "runMain graft.ScaleUp $SRC $AMPBN 10" || log "FAILED ScaleUp bn"
fi
SNM_ENTRIES="dedup_snm dedup_containment dedup_edit_distance dedup_snm_incremental dedup_snm_multipass"
for e in $SNM_ENTRIES; do
  for leg in "1x:$SRC" "10x:$AMP" "10xbn:$AMPBN"; do
    tag=${leg%%:*}; dir=${leg#*:}
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
      SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$e" \
      SPARK_GRAFT_BENCH_OUT=/tmp/graft_snm_${tag}_$e.json \
      sbt -batch "runMain graft.Bench" || log "FAILED snm $tag $e"
  done
done
summarize
log "leg 3 (snm isolated) done"

# ---- leg 4: byte-neutral text sweep --------------------------------------
TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
SPARK_GRAFT_SF_DIR="$AMPBN" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$TEXT_ENTRIES" \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_TEXT.json sbt -batch "runMain graft.Bench" \
  || log "FAILED text 10xbn"
SPARK_GRAFT_SF_DIR="$SRC" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$TEXT_ENTRIES" \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_TEXT_1X.json sbt -batch "runMain graft.Bench" \
  || log "FAILED text 1x"
summarize
log "ALL LEGS DONE"
