"""Calibration-normalized round-over-round bench comparison.

Reads two ``BENCH_r{N}.json`` artifacts and prints per-kernel deltas
both raw and divided by the host-speed calibration ratio, so an
ambient slowdown (round-5's unresolved 54s -> 77s swing) separates
from a plan regression without reading git diffs::

    python scripts/compare_bench.py BENCH_r05.json BENCH_r06.json

A kernel whose raw ratio tracks the calib ratio moved with the host;
a kernel whose normalized ratio is still >1.15 regressed in plan or
code.  Rounds before r06 carry no ``calib`` block — the tool then
reports raw ratios and says the normalization is unavailable.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accepts both the raw bench line and the driver's wrapped
    ``BENCH_r{N}.json`` (bench JSON under a ``parsed`` key)."""
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d) if isinstance(d, dict) else d


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ca = (a.get("calib") or {}).get("tn_min")
    cb = (b.get("calib") or {}).get("tn_min")
    host_ratio = (cb / ca) if (ca and cb) else None
    print(f"{sys.argv[1]}: total {a['value']}s" + (f", calib tn {ca}s" if ca else " (no calib)"))
    print(f"{sys.argv[2]}: total {b['value']}s" + (f", calib tn {cb}s" if cb else " (no calib)"))
    if host_ratio:
        print(f"host-speed ratio (calib_b / calib_a): {host_ratio:.3f}")
    else:
        print("calibration missing on one side — raw ratios only")
    print(f"{'kernel':<10} {'a_s':>8} {'b_s':>8} {'raw_x':>7} {'norm_x':>7}")
    flagged = []
    for k in a["queries"]:
        if k not in b["queries"]:
            continue
        ta, tb = a["queries"][k], b["queries"][k]
        raw = tb / ta if ta else float("inf")
        norm = raw / host_ratio if host_ratio else None
        print(
            f"{k:<10} {ta:>8.2f} {tb:>8.2f} {raw:>7.2f} "
            f"{norm:>7.2f}" if norm is not None else
            f"{k:<10} {ta:>8.2f} {tb:>8.2f} {raw:>7.2f} {'—':>7}"
        )
        if norm is not None and norm > 1.15:
            flagged.append((k, norm))
    if host_ratio:
        tot = (b["value"] / a["value"]) / host_ratio
        print(f"normalized total ratio: {tot:.3f}")
        if flagged:
            print("plan-regression suspects (normalized > 1.15): " +
                  ", ".join(f"{k} {n:.2f}x" for k, n in flagged))
        else:
            print("no kernel regressed beyond host drift")
    return 0


if __name__ == "__main__":
    main()
    sys.exit(0)
