"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — equivalent DuckDB SQL per query for the
value-hash correctness gate.

Implementations live in :mod:`graphdb_testing_spark.queries`; this
module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphdb_testing_spark import datasets
from graphdb_testing_spark import queries as q
from graphdb_testing_spark import queries_analytics  # noqa: F401  (registers)
from graphdb_testing_spark import queries_curation  # noqa: F401  (registers)
from graphdb_testing_spark import queries_graphops  # noqa: F401  (registers)
from graphdb_testing_spark import queries_pipeline  # noqa: F401  (registers)
from graphdb_testing_spark import queries_relational  # noqa: F401  (registers)
from graphdb_testing_spark import queries_sketches  # noqa: F401  (registers)
from graphdb_testing_spark import queries_temporal  # noqa: F401  (registers)
from graphdb_testing_spark.operators.components import (
    component_sizes,
    connected_components,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: connected-component size distribution of the
    part–supplier co-occurrence graph at sf0.001 — exercises scan,
    symmetrize, join, group-by, and the fixpoint driver loop."""
    sf_dir = "/root/testdata/sf0.001"
    g = datasets.part_supplier_graph(spark, sf_dir).canonical()
    labels = connected_components(g.edges)
    sizes = component_sizes(labels)
    g.unpersist()
    return sizes


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column names/values)."""
    return q.all_oracles()
