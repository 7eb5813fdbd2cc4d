#!/bin/bash
# A/B drift canary (BASELINE.md methodology, automated per the r19
# verdict): run a small set of stable canary queries on the CURRENT
# tree AND on a reference commit built in a git worktree — same box,
# same hour — and emit one JSON object with both series. A cross-round
# wall-time delta that shows up in BENCH_LOCAL but NOT in this A/B is
# measurement-day environment, not code; a delta that reproduces here
# is real. Writes CANARY_<tag>.json in the repo root.
#
# Usage: scripts/bench_canary.sh [ref-commit] [tag]
#   ref-commit  commit to A/B against (default: the latest driver
#               round-stamp commit, message "round N: ...")
#   tag         artifact suffix (default: r<N+1> derived from that stamp)
# Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
#      CANARY_QUERIES (default "q_bm25 q_bigram_lm q_ngram_jaccard"),
#      CANARY_REPS (default 3; min across reps is recorded)
set -euo pipefail
cd "$(dirname "$0")/.."

REF=${1:-$(git log --format='%H %s' | awk '$2 ~ /^round$/ {print $1; exit}')}
ROUND=$(git log --format='%s' -1 "$REF" | sed -n 's/^round \([0-9]*\).*/\1/p')
TAG=${2:-r$((${ROUND:-0}+1))}
# default set widened per the r21 verdict: one canary per family the
# rounds have touched PLUS one per previously-untouched family (export,
# sketch, spatial) and the r21 spread casualty (q_pagerank), so a
# harness change can never masquerade as a family-wide win
QUERIES=${CANARY_QUERIES:-"q_bm25 q_bigram_lm q_ngram_jaccard q_ivfpq_persisted q_remap_conservation q_bm25_append q_hybrid_persisted q_stream_frequency q_hourly_dist q_hll_cardinality q_add_inventories q_pagerank"}
REPS=${CANARY_REPS:-3}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
WT=$(mktemp -d /tmp/canary_wt.XXXX)

echo "[canary] ref=$REF tag=$TAG sf=$SF queries=$QUERIES" >&2
git worktree add --force "$WT" "$REF" >&2
trap 'git worktree remove --force "$WT" >/dev/null 2>&1 || true' EXIT
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)

# min rep wall seconds of one query in one tree
run_query() { # $1=tree dir, $2=query
  (cd "$1" && SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.RunOne $2 $SF $REPS" 2>/dev/null) \
    | awk '/\[runone\].*rep/ {t=$(NF-1); if (best=="" || t<best) best=t} END {print best}'
}

PAIRS=""
for q in $QUERIES; do
  CUR=$(run_query . "$q")
  REFT=$(run_query "$WT" "$q")
  echo "[canary] $q cur=${CUR}s ref=${REFT}s" >&2
  PAIRS="$PAIRS\"$q\":{\"cur\":$CUR,\"ref\":$REFT},"
done

LOAD=$(awk '{print $1}' /proc/loadavg)
OUT="CANARY_${TAG}.json"
printf '{"ref":"%s","sf_dir":"%s","reps":%s,"load_avg":%s,"queries":{%s}}\n' \
  "$REF" "$SF" "$REPS" "$LOAD" "${PAIRS%,}" > "$OUT"
echo "[canary] wrote $OUT" >&2
cat "$OUT"
