"""k-truss decomposition (bounded-round peeling).

The k-truss is the maximal subgraph in which every edge closes at
least ``k - 2`` triangles — the edge-analog of the k-core, a standard
cohesive-subgraph kernel (Cohen 2008).  Peeling schedule: compute
per-edge triangle support, drop under-supported edges, repeat; support
is monotone non-increasing under deletions so each round only peels.

Spark-first plan per round: one degree-oriented triangle enumeration
(`triangles.edge_triangle_support` — Σ outdeg² wedges, the same
machinery as the triangle-count kernel), one filter, one
``localCheckpoint`` to keep the iterative plan flat.  Rounds are
bounded (``max_rounds``) with an early exit on stability, so the
bounded-round query is exactly SQL-expressible (unrolled peeling CTE)
— the ``core_numbers_8round`` pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import edge_triangle_support


def ktruss(edges: DataFrame, k: int = 4, max_rounds: int = 10) -> DataFrame:
    """Canonical edge set ``(src, dst)`` of the ``k``-truss after at
    most ``max_rounds`` peeling rounds (early exit when stable; the
    true k-truss once the fixpoint is reached)."""
    cur = (
        edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    n = cur.count()
    for _ in range(max_rounds):
        cur2 = (
            edge_triangle_support(cur)
            .filter(F.col("sup") >= k - 2)
            .select("src", "dst")
            .localCheckpoint()
        )
        n2 = cur2.count()
        if n2 == n:
            break
        cur, n = cur2, n2
        if n == 0:
            break
    return cur
