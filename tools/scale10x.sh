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
# full-sweep entries get a generous per-entry ceiling at 10x (the 1x
# median is ~1 s; 600 s flags a pathological plan without rc-124ing
# the other 250 measurements)
SPARK_GRAFT_SF_DIR="$AMP" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_BENCH.json sbt -batch "runMain graft.Bench" || exit 1

# ---- byte-neutral text sweep (r11 item 6) -------------------------------
# The default "prefix" amplification inflates document text ~2.3x in
# BYTES per 10x in rows, so text-op wall ratios conflate row scaling
# with byte inflation. Re-amplify documents byte-neutrally and re-bench
# the text-dominated entries so their 10x ratios measure ROWS. Both
# scales run the SAME condition (one isolated BENCH_ONLY JVM, reps=1)
# so the ratio is not polluted by sweep-vs-isolated asymmetry.
# Stale artifacts from a previous run are removed FIRST so a failed
# bench can't silently fold last run's numbers into SCALE10X.json.
rm -f SCALE10X_TEXT.json SCALE10X_TEXT_1X.json
TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
AMPBN=${AMPBN:-/tmp/graft_scale10x_bn}
SPARK_GRAFT_SCALEUP_TEXT=byteneutral SPARK_GRAFT_CPUS=$CPUS \
  sbt -batch "runMain graft.ScaleUp $SRC $AMPBN $FACTOR" || exit 1
SPARK_GRAFT_SF_DIR="$AMPBN" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$TEXT_ENTRIES" \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_TEXT.json sbt -batch "runMain graft.Bench" || exit 1
SPARK_GRAFT_SF_DIR="$SRC" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$TEXT_ENTRIES" \
  SPARK_GRAFT_BENCH_OUT=SCALE10X_TEXT_1X.json sbt -batch "runMain graft.Bench" || exit 1

# ---- SNM-family isolated bench (r11 item 7) -----------------------------
# The SNM candidate stage is memoized per session, so in the full sweep
# the FIRST family member pays the shared stage and the rest ride free —
# the committed worst-ratio table was led by that artifact, not a plan
# problem. One fresh JVM per entry per scale charges every entry its
# full cost; ratios below are honest.
SNM_ENTRIES="dedup_snm dedup_containment dedup_edit_distance dedup_snm_incremental dedup_snm_multipass"
rm -f /tmp/graft_snm_*.json

# ---- SNM recall vs exact ground truth (r14 item 3) ----------------------
# The window cap bounds the family's candidate cost linearly; the cost
# is paid FOR recall, so recall at the cap is MEASURED here against the
# PPJoin exact-threshold pair set (lossless prefix filtering — the full
# J >= 0.5 truth, not a sample), single- and multi-pass, at both scales.
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $SRC /tmp/graft_snm_recall_1x.json" || exit 1
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $AMP /tmp/graft_snm_recall_10x.json" || exit 1
for e in $SNM_ENTRIES; do
  SPARK_GRAFT_SF_DIR="$SRC" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$e" \
    SPARK_GRAFT_BENCH_OUT=/tmp/graft_snm_1x_$e.json sbt -batch "runMain graft.Bench" || exit 1
  SPARK_GRAFT_SF_DIR="$AMP" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$e" \
    SPARK_GRAFT_BENCH_OUT=/tmp/graft_snm_10x_$e.json sbt -batch "runMain graft.Bench" || exit 1
  # byteneutral 10x leg: same row count, ~1x bytes/row — separates the
  # auto-window/candidate growth (real, designed) from byte inflation
  SPARK_GRAFT_SF_DIR="$AMPBN" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=600 SPARK_GRAFT_BENCH_ONLY="$e" \
    SPARK_GRAFT_BENCH_OUT=/tmp/graft_snm_10xbn_$e.json sbt -batch "runMain graft.Bench" || exit 1
done

python3 tools/scale10x_summary.py /tmp/scale10x_verify.log
