#!/bin/bash
# Round-17 one-off v5: the remainder after the prefix-corpus legs hit
# the box's spill-disk bound. Everything here fits the disk:
#   1. remaining SNM 30x byteneutral walls
#   2. text at 100xbn (real second decade, per-row linear family)
#   3. graph at 10x/100x
#   4. SnmRecall at 30x on the BYTENEUTRAL corpus (prefix thrashes the
#      disk; the artifact self-documents the corpus via its sf_dir)
#   5. 30xbn SNM value-verify, ceiling 1800 (DuckDB compare foreground)
set -u
cd "$(dirname "$0")/.."

AMP10=/tmp/graft_scale10x
AMP10BN=/tmp/graft_scale10x_bn
AMP30BN=/tmp/graft_scale30x_bn
AMP100=/tmp/graft_scale100x
AMP100BN=/tmp/graft_scale100x_bn
CPUS=32
export SPARK_DRIVER_MEM=64g
CEIL=1800

log() { echo "[r17s100v5 $(date -u +%H:%M:%S)] $*"; }
summarize() { python3 tools/scale100x_summary.py /tmp/scale100x_verify.log || true; }
bench1() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=$CEIL SPARK_GRAFT_BENCH_ONLY="$2" \
    SPARK_GRAFT_BENCH_OUT="$3" sbt -batch "runMain graft.Bench" \
    || log "FAILED bench $2 @ $1"
}

for e in dedup_containment dedup_edit_distance dedup_snm_incremental; do
  [ -f "/tmp/graft_s100_snm_30xbn_$e.json" ] || \
    bench1 "$AMP30BN" "$e" "/tmp/graft_s100_snm_30xbn_$e.json"
  summarize
  log "30xbn wall done: $e"
done

TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
[ -f /tmp/graft_s100_text_10xbn.json ] || \
  bench1 "$AMP10BN"  "$TEXT_ENTRIES" /tmp/graft_s100_text_10xbn.json
[ -f /tmp/graft_s100_text_100xbn.json ] || \
  bench1 "$AMP100BN" "$TEXT_ENTRIES" /tmp/graft_s100_text_100xbn.json
summarize
log "text walls done"

for e in knn_graph graph_pagerank graph_triangles graph_link_pred \
         graph_label_prop graph_kcore graph_assortativity; do
  [ -f "/tmp/graft_s100_graph_10x_$e.json" ] || \
    bench1 "$AMP10"  "$e" "/tmp/graft_s100_graph_10x_$e.json"
  [ -f "/tmp/graft_s100_graph_100x_$e.json" ] || \
    bench1 "$AMP100" "$e" "/tmp/graft_s100_graph_100x_$e.json"
  summarize
  log "graph walls done: $e"
done

[ -f /tmp/graft_snm_recall_30x.json ] || \
  SPARK_GRAFT_CPUS=$CPUS sbt -batch \
    "runMain graft.SnmRecall $AMP30BN /tmp/graft_snm_recall_30x.json" \
    || log "FAILED SnmRecall 30xbn"
summarize
log "30xbn recall done"

SNM_CSV="dedup_snm,dedup_containment,dedup_edit_distance,dedup_snm_incremental,dedup_snm_multipass"
OUT30BN=/tmp/graft_verify30xbn
rm -rf "$OUT30BN"
SPARK_GRAFT_ONLY="$SNM_CSV" SPARK_GRAFT_VERIFY_CEILING=1800 SPARK_GRAFT_CPUS=$CPUS \
  sbt -batch "runMain graft.Verify $AMP30BN $OUT30BN" || log "FAILED 30xbn Verify snm"
BASE10=/tmp/graft_verify10x/counts.json
if [ -f "$BASE10" ]; then
  python3 tools/local_verify.py "$AMP30BN" "$OUT30BN" --baseline "$BASE10" \
    --factor 3 >> /tmp/scale100x_verify.log 2>&1
else
  python3 tools/local_verify.py "$AMP30BN" "$OUT30BN" \
    >> /tmp/scale100x_verify.log 2>&1
fi
summarize
log "ALL v5 LEGS DONE"
