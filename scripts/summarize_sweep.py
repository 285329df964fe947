"""Summarize a check_oracles sweep log into BENCHMARKS-ready stats.

Usage: python scripts/summarize_sweep.py /tmp/sf01_sweep.log
"""
import re
import statistics
import sys


def main(path: str) -> None:
    ok, to, fail, times = [], [], [], []
    # ok lines: "(spark 8.4s, duck 0.1s)"; timeout lines: "(spark side
    # ran: N rows, 8.4s)"; rows-only: "(2.1s)" — match all three so
    # the slowest (often timed-out) queries aren't dropped from stats
    pat = re.compile(r"spark ([0-9.]+)s|, ([0-9.]+)s\)|\(([0-9.]+)s\)")
    for line in open(path):
        if not line.startswith("[") or "] " not in line:
            continue  # skip truncated/wrapped lines (ADVICE r3)
        name = line.split("] ", 1)[1].split(":")[0].strip()
        m = pat.search(line)
        if m:
            t = next(g for g in m.groups() if g is not None)
            times.append((float(t), name))
        if line.startswith("[ok"):
            ok.append(name)
        elif line.startswith("[oracle-to"):
            to.append(name)
        elif line.startswith("[FAIL"):
            fail.append(name)
    ts = sorted(t for t, _ in times)
    print(f"ok={len(ok)} oracle-timeout={len(to)} FAIL={len(fail)} total={len(ok)+len(to)+len(fail)}")
    if ts:
        import math

        p90 = ts[math.ceil(0.9 * len(ts)) - 1]  # nearest-rank
        print(
            f"spark-side: median {statistics.median(ts):.1f}s "
            f"p90 {p90:.1f}s max {ts[-1]:.1f}s "
            f"total {sum(ts)/60:.1f} min"
        )
        print("slowest:", sorted(times, reverse=True)[:8])
    if fail:
        print("FAILURES:", fail)
    if to:
        print("oracle timeouts (value-checked at sf0.01 instead):", to)


if __name__ == "__main__":
    main(sys.argv[1])
