#!/bin/bash
# Round-17 one-off v4: final ordering for the remaining round clock.
# The dedup_snm 30x BYTENEUTRAL ratio (2.95 for 3x rows) already
# confirmed past-cap linearity; the prefix legs conflate byte
# inflation and were disk-thrashing, so they are dropped. Remaining
# value order: recall at 30x, the 30x family value-verify, the other
# entries' 30xbn walls, text at 100xbn, graph.
set -u
cd "$(dirname "$0")/.."

AMP10=/tmp/graft_scale10x
AMP10BN=/tmp/graft_scale10x_bn
AMP30=/tmp/graft_scale30x
AMP30BN=/tmp/graft_scale30x_bn
AMP100=/tmp/graft_scale100x
AMP100BN=/tmp/graft_scale100x_bn
OUT30=/tmp/graft_verify30x
CPUS=32
export SPARK_DRIVER_MEM=64g
CEIL=1800

log() { echo "[r17s100v4 $(date -u +%H:%M:%S)] $*"; }
summarize() { python3 tools/scale100x_summary.py /tmp/scale100x_verify.log || true; }
bench1() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=$CEIL SPARK_GRAFT_BENCH_ONLY="$2" \
    SPARK_GRAFT_BENCH_OUT="$3" sbt -batch "runMain graft.Bench" \
    || log "FAILED bench $2 @ $1"
}

# ---- 1. SnmRecall at 30x -------------------------------------------------
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $AMP30 /tmp/graft_snm_recall_30x.json" \
  || log "FAILED SnmRecall 30x"
summarize
log "30x recall done"

# ---- 2. 30x SNM-family value-verify (compare in background) --------------
SNM_CSV="dedup_snm,dedup_containment,dedup_edit_distance,dedup_snm_incremental,dedup_snm_multipass"
rm -rf "$OUT30"
SPARK_GRAFT_ONLY="$SNM_CSV" SPARK_GRAFT_CPUS=$CPUS \
  sbt -batch "runMain graft.Verify $AMP30 $OUT30" || log "FAILED 30x Verify snm"
BASE10=/tmp/graft_verify10x/counts.json
if [ -f "$BASE10" ]; then
  python3 tools/local_verify.py "$AMP30" "$OUT30" --baseline "$BASE10" \
    --factor 3 >> /tmp/scale100x_verify.log 2>&1 &
else
  python3 tools/local_verify.py "$AMP30" "$OUT30" \
    >> /tmp/scale100x_verify.log 2>&1 &
fi
VPID=$!
log "30x DuckDB compare launched (pid $VPID)"

# ---- 3. remaining 30xbn walls -------------------------------------------
for e in dedup_snm_multipass dedup_containment dedup_edit_distance \
         dedup_snm_incremental; do
  [ -f "/tmp/graft_s100_snm_30xbn_$e.json" ] || \
    bench1 "$AMP30BN" "$e" "/tmp/graft_s100_snm_30xbn_$e.json"
  summarize
  log "30xbn wall done: $e"
done

# ---- 4. text at 100xbn ---------------------------------------------------
TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
[ -f /tmp/graft_s100_text_10xbn.json ] || \
  bench1 "$AMP10BN"  "$TEXT_ENTRIES" /tmp/graft_s100_text_10xbn.json
[ -f /tmp/graft_s100_text_100xbn.json ] || \
  bench1 "$AMP100BN" "$TEXT_ENTRIES" /tmp/graft_s100_text_100xbn.json
summarize
log "text walls done"

# ---- 5. graph at 10x/100x (time permitting) ------------------------------
for e in knn_graph graph_pagerank graph_triangles graph_link_pred \
         graph_label_prop graph_kcore graph_assortativity; do
  [ -f "/tmp/graft_s100_graph_10x_$e.json" ] || \
    bench1 "$AMP10"  "$e" "/tmp/graft_s100_graph_10x_$e.json"
  [ -f "/tmp/graft_s100_graph_100x_$e.json" ] || \
    bench1 "$AMP100" "$e" "/tmp/graft_s100_graph_100x_$e.json"
  summarize
  log "graph walls done: $e"
done

log "waiting for 30x DuckDB compare (pid $VPID)"
wait "$VPID"
summarize
log "ALL v4 LEGS DONE"
