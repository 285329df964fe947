#!/bin/bash
# Full-registry oracle sweep (round-10 verdict task 1): every
# queries() entry vs its DuckDB oracle at one sf dir, three
# interleaved shards like the round-8 sweep, one merged log.
#
# Usage: scripts/run_registry_sweep.sh <sf_dir> <out_log> [header]
set -u
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; HDR="${3:-}"

python - <<'EOF' > /tmp/sweep_qnames.txt
import sys
sys.path.insert(0, ".")
import __spark_entry__ as e
print("\n".join(e.queries()))
EOF
N=$(wc -l < /tmp/sweep_qnames.txt)

for i in 0 1 2; do
  awk -v i="$i" 'NR % 3 == i' /tmp/sweep_qnames.txt > "/tmp/sweep_shard$i.txt"
done

echo "# $HDR" > "$OUT.tmp"
echo "# three interleaved shards (SWEEP_SHARD=r10t0/r10t1/r10t2), ORACLE_DUCK_THREADS=8, ORACLE_TIMEOUT_S=${ORACLE_TIMEOUT_S:-1800}, registry size $N" >> "$OUT.tmp"
echo "# rows carry [ctx=shard/load] — parallel-shard times are contention-noisy; quiet-host timing lives in BENCH/SCALE artifacts, not here" >> "$OUT.tmp"

pids=()
for i in 0 1 2; do
  SWEEP_SHARD="r10t$i" SPARK_GRAFT_CPUS=10 SPARK_GRAFT_SHUFFLE=16 \
  SPARK_GRAFT_DRIVER_MEM=24g ORACLE_DUCK_THREADS=8 \
  ORACLE_TIMEOUT_S="${ORACLE_TIMEOUT_S:-1800}" \
  python scripts/check_oracles.py "$SF" $(cat "/tmp/sweep_shard$i.txt") \
    > "/tmp/sweep_out$i.log" 2> "/tmp/sweep_err$i.log" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done

cat /tmp/sweep_out0.log /tmp/sweep_out1.log /tmp/sweep_out2.log >> "$OUT.tmp"
OK=$(grep -c '^\[ok' "$OUT.tmp")
BAD=$(grep -cE '^\[(FAIL|err|oracle-to)' "$OUT.tmp")
sed -i "1s|^# |# ${OK}/${N} ok, ${BAD} fail/err/timeout — |" "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "sweep $SF: $OK/$N ok, $BAD bad (rc=$rc) -> $OUT"
