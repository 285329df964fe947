"""Time individual driver-contract queries at a given sf directory.

Usage::

    python scripts/profile_queries.py [--json OUT] [sf_dir] query [query ...]

Prints one line per query: name, wall seconds, row count.  Used to
profile the heavier analytics (betweenness, community, core numbers)
that bench.py does not time per-round, and — with ``--json`` — to
record the quiet-host serial times of the sweep's heaviest queries
(``SWEEP_TIMES_r{N}.json``), the trustworthy companion to the
contention-noisy parallel sweep logs.  Run it on a QUIET host; each
record carries the load average at measurement time so a reader can
tell.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


def main() -> int:
    import json

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:]
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark(
        app_name="graphdb-testing-spark-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    records = []
    for name in names:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        records.append(
            {
                "query": name,
                "spark_s": round(dt, 2),
                "rows": n,
                "load1": round(os.getloadavg()[0], 1),
            }
        )
        print(f"{name}: {dt:.2f}s rows={n}", flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "note": (
                        "serial quiet-host re-times of the sweep's heaviest "
                        "queries; sharded sweep-log row times are contention "
                        "noise (see check_oracles.py docstring)"
                    ),
                    "sf_dir": sf_dir,
                    "mode": "serial",
                    "times": records,
                },
                f,
                indent=1,
            )
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
