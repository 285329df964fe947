#!/bin/bash
# Round-10 SCALE-24 CC attribution session (round-9 verdict task 2).
#
# CC@SCALE-24 read 791s on a shuffle-probe-quiet host vs the round-5
# record 383.8s with unchanged kernel code.  The shuffle probe never
# touches disk, so an I/O-cold regime was invisible.  This session
# measures CC in four controlled regimes, each its own process, each
# stamped by BOTH probes (join+agg+shuffle AND fixed-file parquet
# scan), appending one JSON line per run to SCALE24_r10.log:
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
LOG=SCALE24_r10.log
ERR=SCALE24_r10.err.log

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
