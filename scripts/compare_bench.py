"""Calibration-normalized round-over-round bench comparison.

Reads two ``BENCH_r{N}.json`` artifacts and prints per-kernel deltas
raw and divided by the host-speed calibration ratio, so an ambient
slowdown separates from a plan regression without reading git diffs::

    python scripts/compare_bench.py BENCH_r05.json BENCH_r06.json

Two calibration probes (round-8, after the round-7 post-mortem where
the CPU loop measured the host FASTER while every kernel ran 1.4-1.6x
slower):

- ``tn``  — xxhash busy loop: pure-CPU speed (codegen arithmetic);
- ``ts``  — join+agg+shuffle probe: the memory-bandwidth / IO /
  scheduler contention path the kernels actually run on.

Normalization PREFERS ``ts`` when both artifacts carry it and falls
back to ``tn`` (pre-r08 artifacts have no ``ts``).  A kernel whose
raw ratio tracks the probe ratio moved with the host; a kernel whose
normalized ratio is still >1.15 is a plan/code suspect — confirm with
``python bench.py --against <git-ref>``, which runs both codebases
interleaved on the same host and yields a pure code ratio.
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
    ca, cb = a.get("calib") or {}, b.get("calib") or {}
    ratios: dict[str, float] = {}
    for probe in ("tn", "ts"):
        pa, pb = ca.get(f"{probe}_min"), cb.get(f"{probe}_min")
        if pa and pb:
            ratios[probe] = pb / pa
    # the shuffle probe sees ambient contention the CPU loop misses —
    # use it for the verdict when both sides have it
    norm_probe = "ts" if "ts" in ratios else ("tn" if "tn" in ratios else None)
    host_ratio = ratios.get(norm_probe) if norm_probe else None
    for path, d, c in ((sys.argv[1], a, ca), (sys.argv[2], b, cb)):
        calib_s = " ".join(
            f"{p}={c[f'{p}_min']}s" for p in ("tn", "ts") if c.get(f"{p}_min")
        )
        print(f"{path}: total {d['value']}s" + (f", calib {calib_s}" if calib_s else " (no calib)"))
    for probe, r in ratios.items():
        tag = " <- normalizer" if probe == norm_probe else ""
        print(f"host-speed ratio via {probe} (b/a): {r:.3f}{tag}")
    if not host_ratio:
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
        print(f"normalized total ratio (via {norm_probe}): {tot:.3f}")
        if flagged:
            print(
                "plan-regression suspects (normalized > 1.15): "
                + ", ".join(f"{k} {n:.2f}x" for k, n in flagged)
                + "\nconfirm with: python bench.py --against <previous-round-ref>"
            )
        else:
            print("no kernel regressed beyond host drift")
    return 0


if __name__ == "__main__":
    main()
    sys.exit(0)
