#!/bin/bash
# Round-11 SCALE-24 follow-up (runs after attribute_scale24_r11.sh):
#
#   5. warm resume, ROUND-11-BASELINE code (worktree at $BASE_REF) —
#      the clean warm+old-code twin of run 3, closing the code-vs-
#      regime attribution for the narrow-id CC loop.
#   6-8. sssp / pr / update re-measures with HEAD (narrow-id) code —
#      the round-10 verdict's "re-measure SCALE-24" kernels (trickle
#      stream is profiled separately by profile_trickle_stages.py).
#
# Appends to SCALE24_r11.log like the matrix script.
set -u
cd "$(dirname "$0")/.."
LOG=$(pwd)/SCALE24_r11.log
ERR=$(pwd)/SCALE24_r11.err.log
BASE_REF=${BASE_REF:-78be986}
CACHE=$(pwd)/.bench_cache

run() {
  local tag="$1"; shift
  echo "### run=$tag $(date -u +%FT%TZ) load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG" >> "$ERR"
  "$@" >> "$LOG" 2>> "$ERR"
  echo "### done=$tag rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG" >> "$ERR"
}

# 5. warm resume with baseline (pre-narrow-id) code from a worktree,
#    same cache dir so the same graph + state are reused
git worktree prune
WT=$(mktemp -d /tmp/scale24-base-XXXX)
git worktree add --detach --force "$WT" "$BASE_REF" >> "$ERR" 2>&1
(
  cd "$WT"
  SPARK_GRAFT_BENCH_CACHE="$CACHE" run warm_resume_cc_basecode \
    python scripts/bench_rmat.py large --redo sv --kernels sv
)
git worktree remove --force "$WT" >> "$ERR" 2>&1

# 6-8. HEAD re-measures of the remaining verdict kernels
run sssp_head python scripts/bench_rmat.py large --redo sssp --kernels sssp
run pr_head python scripts/bench_rmat.py large --redo pr --kernels pr
run update_head python scripts/bench_rmat.py large --redo update --kernels update

echo "### followup complete $(date -u +%FT%TZ)" >> "$LOG"
