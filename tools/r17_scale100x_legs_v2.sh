#!/bin/bash
# Round-17 one-off v2: the 100x runner, re-trimmed against the round
# clock. The 10x/10xbn legs of the SNM decade-2 ratios REUSE the
# same-day, same-condition (one fresh JVM per entry, reps=1, same box)
# isolated measurements the 10x sweep's leg 3 just produced — running
# them again would spend ~20 min of round wall re-measuring numbers
# recorded an hour earlier. The saved time goes to the 100x walls,
# the 100x value-verify, and the 100x recall.
# Arg 1 = PID of the still-running orphaned 100xbn dedup_snm bench.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
AMP10=/tmp/graft_scale10x
AMP100=/tmp/graft_scale100x
AMP100BN=/tmp/graft_scale100x_bn
OUT100=/tmp/graft_verify100x
CPUS=32
export SPARK_DRIVER_MEM=64g
CEIL=1800

log() { echo "[r17s100v2 $(date -u +%H:%M:%S)] $*"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for in-flight bench (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi

# seed the 10x-side legs from the 10x sweep's isolated SNM files
for e in dedup_snm dedup_snm_multipass dedup_containment \
         dedup_edit_distance dedup_snm_incremental; do
  [ -f "/tmp/graft_s100_snm_10x_$e.json" ] || \
    cp "/tmp/graft_snm_10x_$e.json" "/tmp/graft_s100_snm_10x_$e.json" 2>/dev/null \
    || log "missing 10x seed for $e"
  [ -f "/tmp/graft_s100_snm_10xbn_$e.json" ] || \
    cp "/tmp/graft_snm_10xbn_$e.json" "/tmp/graft_s100_snm_10xbn_$e.json" 2>/dev/null \
    || log "missing 10xbn seed for $e"
done

summarize() { python3 tools/scale100x_summary.py /tmp/scale100x_verify.log || true; }
bench1() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=$CEIL SPARK_GRAFT_BENCH_ONLY="$2" \
    SPARK_GRAFT_BENCH_OUT="$3" sbt -batch "runMain graft.Bench" \
    || log "FAILED bench $2 @ $1"
}

# ---- 100x walls, dedup_snm (the prediction row) first --------------------
for e in dedup_snm dedup_snm_multipass dedup_containment \
         dedup_edit_distance dedup_snm_incremental; do
  [ -f "/tmp/graft_s100_snm_100xbn_$e.json" ] || \
    bench1 "$AMP100BN" "$e" "/tmp/graft_s100_snm_100xbn_$e.json"
  [ -f "/tmp/graft_s100_snm_100x_$e.json" ] || \
    bench1 "$AMP100"   "$e" "/tmp/graft_s100_snm_100x_$e.json"
  summarize
  log "100x walls done: $e"
done

# ---- 100x SNM-family value-verify (dump), then compare in background ----
SNM_CSV="dedup_snm,dedup_containment,dedup_edit_distance,dedup_snm_incremental,dedup_snm_multipass"
rm -rf "$OUT100"
SPARK_GRAFT_ONLY="$SNM_CSV" SPARK_GRAFT_CPUS=$CPUS \
  sbt -batch "runMain graft.Verify $AMP100 $OUT100" || log "FAILED 100x Verify snm"
BASE10=/tmp/graft_verify10x/counts.json
if [ -f "$BASE10" ]; then
  python3 tools/local_verify.py "$AMP100" "$OUT100" --baseline "$BASE10" \
    --factor 10 >> /tmp/scale100x_verify.log 2>&1 &
else
  python3 tools/local_verify.py "$AMP100" "$OUT100" \
    >> /tmp/scale100x_verify.log 2>&1 &
fi
VPID=$!
log "100x DuckDB compare launched (pid $VPID)"

# ---- SnmRecall at 100x, concurrent with the compare ---------------------
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $AMP100 /tmp/graft_snm_recall_100x.json" \
  || log "FAILED SnmRecall 100x"
summarize
log "100x recall done; waiting for compare (pid $VPID)"
wait "$VPID"
summarize
log "100x snm verify done"

# ---- text + graph walls (time permitting) -------------------------------
TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
AMP10BN=/tmp/graft_scale10x_bn
bench1 "$AMP10BN"  "$TEXT_ENTRIES" /tmp/graft_s100_text_10xbn.json
bench1 "$AMP100BN" "$TEXT_ENTRIES" /tmp/graft_s100_text_100xbn.json
summarize
log "text walls done"
for e in graph_triangles graph_pagerank graph_link_pred graph_label_prop \
         graph_kcore graph_assortativity knn_graph; do
  bench1 "$AMP10"  "$e" "/tmp/graft_s100_graph_10x_$e.json"
  bench1 "$AMP100" "$e" "/tmp/graft_s100_graph_100x_$e.json"
  summarize
done
log "ALL 100x LEGS DONE"
