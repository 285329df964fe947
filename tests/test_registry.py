"""Registry-wide contract guards: every driver query has a parseable
oracle and a well-formed callable — catches registration breakage
before the driver does."""

from __future__ import annotations

import inspect

import duckdb
import pytest


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_every_query_has_a_parseable_oracle():
    qs, oracles = _registry()
    assert set(qs) == set(oracles), "queries() and oracle_sql() diverge"
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_every_query_callable_takes_spark_and_sfdir():
    qs, _ = _registry()
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)


def test_query_names_are_wellformed():
    qs, _ = _registry()
    for name in qs:
        assert name == name.lower() and " " not in name, name
