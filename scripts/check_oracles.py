"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` in
DuckDB over the same sf directory, then compares row count, column
names, and order-insensitive values.  Usage::

    python scripts/check_oracles.py [sf_dir] [query ...]

``ORACLE_TIMEOUT_S`` (env, default 120) interrupts a DuckDB oracle
that runs past the limit and records ``[oracle-to ]`` instead of
hanging the sweep — several oracles are transitive-closure recursive
CTEs that are exact but quadratic, fine at sf0.01 and infeasible at
sf0.1; the Spark side still executes and row-counts.

Every timing row is stamped with its concurrency context
(``ctx=shard/load`` — ``SWEEP_SHARD`` env tag plus the host 1-min
load average at row time), because per-row times from PARALLEL shard
runs are contention noise, not a perf signal: round 6's sharded log
showed a query at 91s that a quiet host runs in 26.5s.  Diagnose
regressions only from rows whose load was quiet, or re-time with
``scripts/profile_queries.py``.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from graphdb_testing_spark.datasets import TABLES  # noqa: E402
from graphdb_testing_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    con = duckdb.connect()
    import os as _os

    nthreads = _os.environ.get("ORACLE_DUCK_THREADS")
    if nthreads:
        # cap DuckDB's core usage so a long high-watchdog sweep can
        # share the host with a timed bench run
        con.execute(f"SET threads = {int(nthreads)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    shard = _os.environ.get("SWEEP_SHARD", "serial")

    def _ctx() -> str:
        load = _os.getloadavg()[0]
        return f"ctx={shard}/load{load:.0f}"

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(sdf)} rows ({t_spark:.1f}s) [{_ctx()}]"
            )
            continue
        import os
        import threading

        timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "120"))
        t0 = time.time()
        # per-query cursor: shares the catalog (views) but isolates
        # the interrupt flag, so a timer that fires just after a
        # query completes cannot poison the NEXT oracle
        cur = con.cursor()
        timer = threading.Timer(timeout_s, cur.interrupt)
        timer.start()
        try:
            ddf = cur.execute(oracles[name]).fetchdf()
        except duckdb.InterruptException:
            print(
                f"[oracle-to ] {name}: DuckDB oracle exceeded "
                f"{timeout_s:.0f}s (spark side ran: {len(sdf)} rows, "
                f"{t_spark:.1f}s) — value-checked at sf0.01 instead"
            )
            continue
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL-sql ] {name}: oracle SQL error: {exc}")
            failures += 1
            continue
        finally:
            timer.cancel()
            cur.close()
        t_duck = time.time() - t0
        a, b = normalize(sdf), normalize(ddf)
        status = "ok"
        if list(a.columns) != list(b.columns):
            status = f"COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
            except AssertionError as exc:
                status = f"VALUE MISMATCH: {str(exc)[:400]}"
            else:
                # The driver's value-hash is dtype-sensitive (a DuckDB
                # HUGEINT column hashes differently from Spark's int64
                # even when the values are equal), so flag dtype drift
                # that check_dtype=False would hide.
                bad = [
                    (c, str(a[c].dtype), str(b[c].dtype))
                    for c in a.columns
                    if str(a[c].dtype) != str(b[c].dtype)
                ]
                if bad:
                    status = f"DTYPE MISMATCH (spark,duck): {bad}"
        tag = "ok        " if status == "ok" else "FAIL      "
        print(
            f"[{tag}] {name}: {len(a)} rows (spark {t_spark:.1f}s, "
            f"duck {t_duck:.1f}s) [{_ctx()}]"
            + ("" if status == "ok" else f"\n    {status}")
        )
        if status != "ok":
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
