#!/bin/bash
# Round-17 one-off: value-ordered subset of tools/scale100x.sh, chained
# behind the 10x sweep's legs (arg = PID to wait for). Ordering puts
# the judge-named rows first so a round-end kill still leaves a
# committable SCALE100X.json:
#   1. SNM walls, dedup_snm first (the decade-2 prediction check)
#   2. 100x SNM-family value-verify (Spark dump, then the DuckDB
#      compare in the BACKGROUND — timing-insensitive — concurrent
#      with step 3)
#   3. SnmRecall at 100x (recall one decade past the cap)
#   4. text + graph families if the round clock allows
# tools/scale100x_summary.py re-assembles after every milestone.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
SRC=/root/testdata/sf0.1
AMP10=/tmp/graft_scale10x
AMP10BN=/tmp/graft_scale10x_bn
AMP100=/tmp/graft_scale100x
AMP100BN=/tmp/graft_scale100x_bn
OUT100=/tmp/graft_verify100x
CPUS=32
export SPARK_DRIVER_MEM=64g
CEIL=1800

log() { echo "[r17s100 $(date -u +%H:%M:%S)] $*"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for 10x legs (pid $WAIT_PID)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

# all four corpora must already exist (prior session built them)
for d in "$AMP10" "$AMP10BN" "$AMP100" "$AMP100BN"; do
  [ -d "$d/lineitem.parquet" ] || { log "missing corpus $d"; exit 1; }
done

rm -f /tmp/graft_s100_*.json /tmp/graft_snm_recall_100x.json /tmp/scale100x_verify.log
rm -rf "$OUT100" /tmp/graft_verify100x_tg
summarize() { python3 tools/scale100x_summary.py /tmp/scale100x_verify.log || true; }
bench1() { # bench1 <sfdir> <entries> <outjson>
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_CEILING=$CEIL SPARK_GRAFT_BENCH_ONLY="$2" \
    SPARK_GRAFT_BENCH_OUT="$3" sbt -batch "runMain graft.Bench" \
    || log "FAILED bench $2 @ $1"
}

# ---- 1. SNM walls, dedup_snm (the prediction row) first ------------------
for e in dedup_snm dedup_snm_multipass dedup_containment \
         dedup_edit_distance dedup_snm_incremental; do
  bench1 "$AMP10BN"  "$e" "/tmp/graft_s100_snm_10xbn_$e.json"
  bench1 "$AMP100BN" "$e" "/tmp/graft_s100_snm_100xbn_$e.json"
  bench1 "$AMP10"    "$e" "/tmp/graft_s100_snm_10x_$e.json"
  bench1 "$AMP100"   "$e" "/tmp/graft_s100_snm_100x_$e.json"
  summarize
  log "snm walls done: $e"
done

# ---- 2. 100x SNM-family value-verify --------------------------------------
SNM_CSV="dedup_snm,dedup_containment,dedup_edit_distance,dedup_snm_incremental,dedup_snm_multipass"
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

# ---- 3. SnmRecall at 100x (concurrent with the DuckDB compare; both
#         are timing-insensitive) -------------------------------------------
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.SnmRecall $AMP100 /tmp/graft_snm_recall_100x.json" \
  || log "FAILED SnmRecall 100x"
summarize
log "100x recall done; waiting for 100x DuckDB compare (pid $VPID)"
wait "$VPID"
summarize
log "100x snm verify done"

# ---- 4. text + graph families (time permitting) ----------------------------
TEXT_ENTRIES="text_scrub,text_tokens,text_langid,text_quality,text_fingerprint,text_repetition,text_entropy,text_feature_hash,text_readability,text_bpe_train,text_bpe_apply"
bench1 "$AMP10BN"  "$TEXT_ENTRIES" /tmp/graft_s100_text_10xbn.json
bench1 "$AMP100BN" "$TEXT_ENTRIES" /tmp/graft_s100_text_100xbn.json
summarize
log "text walls done"

for e in graph_triangles graph_pagerank graph_link_pred graph_label_prop \
         graph_kcore graph_assortativity knn_graph; do
  bench1 "$AMP10"  "$e" "/tmp/graft_s100_graph_10x_$e.json"
  bench1 "$AMP100" "$e" "/tmp/graft_s100_graph_100x_$e.json"
done
summarize
log "graph walls done"

# text+graph value-verify at 100x — its OWN out dir (Verify never
# wipes an existing dump dir, and the compare walks every subdir, so
# reusing OUT100 would re-run the slow SNM oracles a second time)
OUT100TG=/tmp/graft_verify100x_tg
TG_CSV="$TEXT_ENTRIES,graph_triangles,graph_pagerank,graph_link_pred,graph_label_prop,graph_kcore,graph_assortativity,knn_graph"
SPARK_GRAFT_ONLY="$TG_CSV" SPARK_GRAFT_CPUS=$CPUS \
  sbt -batch "runMain graft.Verify $AMP100 $OUT100TG" || log "FAILED 100x Verify text+graph"
if [ -f "$BASE10" ]; then
  python3 tools/local_verify.py "$AMP100" "$OUT100TG" --baseline "$BASE10" \
    --factor 10 >> /tmp/scale100x_verify.log 2>&1
else
  python3 tools/local_verify.py "$AMP100" "$OUT100TG" >> /tmp/scale100x_verify.log 2>&1
fi
summarize
log "ALL 100x LEGS DONE"
