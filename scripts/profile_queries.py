"""Time individual driver-contract queries at a given sf directory.

Usage::

    python scripts/profile_queries.py [sf_dir] query [query ...]

Prints one line per query: name, wall seconds, row count.  Used to
profile the heavier analytics (betweenness, community, core numbers)
that bench.py does not time per-round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark(
        app_name="graphdb-testing-spark-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        print(f"{name}: {time.time() - t0:.2f}s rows={n}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
