#!/bin/bash
# Round-11 SCALE-24 CC attribution session (round-10 verdict task 1).
#
# Re-runs the four-regime matrix whose round-10 artifact was lost with
# the killed evidence session (SCALE24_r10.log — retraction notes in
# COVERAGE.md / BENCHMARKS.md).  Code under test is the round-10 HEAD,
# whose above-guard CC plan is byte-identical to round 9's (r10 verdict
# confirmed), so these runs adjudicate the r9 791s-vs-r5 383.8s CC
# swing directly.  Each regime is its own process, each kernel stamped
# by THREE probes (join+agg+shuffle, fixed-file parquet scan, and the
# single-thread STREAM-like memory-bandwidth probe added for exactly
# this question), appending one JSON line per run to SCALE24_r11.log:
#
#   1. fresh-after-build  (hot page cache — round 5's regime)
#   2. cold resume        (page cache dropped — round 9's regime, made
#                          genuinely cold instead of accidentally so)
#   3. warm resume        (cache warmed by run 2 — isolates "resume"
#                          from "cold I/O")
#   4. warm resume, AQE skew-join OFF (isolates AQE skew handling)
#
# Run on a quiet host.  ~1.5h total.
set -u
cd "$(dirname "$0")/.."
LOG=SCALE24_r11.log
ERR=SCALE24_r11.err.log

run() {
  local tag="$1"; shift
  echo "### run=$tag $(date -u +%FT%TZ) load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG" >> "$ERR"
  "$@" >> "$LOG" 2>> "$ERR"
  echo "### done=$tag rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG" >> "$ERR"
}

drop_caches() {
  sync
  echo 3 > /proc/sys/vm/drop_caches 2>> "$ERR" \
    && echo "### page cache dropped" >> "$LOG" \
    || echo "### drop_caches UNAVAILABLE — 'cold' runs are best-effort" >> "$LOG"
}

# 1. fresh build + CC immediately after (hot regime, r5's)
run fresh_build_cc_hot python scripts/bench_rmat.py large --fresh --kernels build,sv

# 2. cold resume: new process, page cache genuinely dropped
drop_caches
run cold_resume_cc python scripts/bench_rmat.py large --redo sv --kernels sv

# 3. warm resume: same cache state run 2 left behind
run warm_resume_cc python scripts/bench_rmat.py large --redo sv --kernels sv

# 4. warm resume with AQE skew-join disabled
SPARK_GRAFT_AQE_SKEW=false run warm_resume_cc_noskew \
  python scripts/bench_rmat.py large --redo sv --kernels sv

echo "### session complete $(date -u +%FT%TZ)" >> "$LOG"
