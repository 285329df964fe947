"""PageRank with the reference's canonical parameters.

Reference semantics (SURVEY.md §2.4), identical across backends:
``damping d = 0.85``, ``epsilon = 1e-8`` (L1 delta), ``maxiter =
100``, init ``1/nv``, pull form::

    pr'[v] = (1-d)/nv + d * Σ_{u ∈ N(v)} pr[u] / outdeg(u)

(reference ``tests/stinger/src/alg/static_pagerank.c:286-328``;
relational form ``tests/sqlite/test.c:260-301``).  On the symmetric
benchmark graphs push over ``src`` and pull over ``dst`` coincide;
every vertex has degree ≥ 1 so there is no dangling mass (matching
the reference, which likewise ignores dangling vertices).

Spark-first design
------------------
* Vertex state ``(id, degree, pr)`` is one O(nv) DataFrame; a round
  is one ``edges ⋈ state`` join + partial-aggregated
  ``groupBy(src).sum`` — the big edge side stays put (pre-partitioned
  on ``src``), only the state shuffles, and Catalyst broadcasts the
  state when it fits.
* **Rounds are unrolled**: ``unroll`` rounds are composed lazily into
  one plan, then materialized with a single eager ``localCheckpoint``
  (which also truncates lineage — unbounded plan growth otherwise
  makes round cost O(iteration)).  Driver-side job scheduling is the
  per-round floor on a fast cluster, so fewer/bigger jobs win; the
  shuffle structure per round is unchanged.
* The L1 convergence delta is measured once per chunk against the
  chunk's starting vector (k-round delta ≥ the reference's 1-round
  delta, so stopping is conservative — never earlier than the
  reference's epsilon rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import state_hint


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    num_iter: int | None = None,
    unroll: int = 6,  # measured sweet spot: plan analysis cost grows
    # ~2^unroll (state referenced twice per round), job overhead
    # shrinks ~1/unroll; 6 wins on local[32], 10 already regresses
) -> DataFrame:
    """``(id, pr)`` PageRank over a symmetric edge table.

    ``num_iter`` forces an exact iteration count with no convergence
    test (used for the unrolled-SQL DuckDB oracle); otherwise the loop
    stops when the chunk L1 delta ≤ ``tol``, like the reference
    (``static_pagerank.c:295-298`` — whose ``iter`` is never
    decremented, so epsilon is the only real exit there too).
    """
    e = edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    nv = deg.count()
    base = (1.0 - damping) / nv
    state = deg.withColumn("pr", F.lit(1.0 / nv)).localCheckpoint()

    total = num_iter if num_iter is not None else max_iter
    done = 0
    while done < total:
        k = min(unroll, total - done)
        chunk_start = state
        for _ in range(k):
            # broadcast the O(nv) state so the big edge side never
            # moves; the groupBy then shuffles only partial aggregates
            contribs = (
                e.join(state_hint(state, nv), e.dst == state.id)
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum(F.col("pr") / F.col("degree")).alias("mass"))
            )
            state = (
                state.join(state_hint(contribs, nv), "id", "left")
                .select(
                    "id",
                    "degree",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                    ).alias("pr"),
                )
            )
        state = state.localCheckpoint()  # one job: materialize k rounds
        done += k
        if num_iter is None:
            delta = (
                state.select("id", "pr")
                .join(
                    chunk_start.select("id", F.col("pr").alias("pr0")), "id"
                )
                .agg(F.sum(F.abs(F.col("pr") - F.col("pr0"))).alias("d"))
                .collect()[0]["d"]
            )
            chunk_start.unpersist()
            if delta is not None and delta <= tol:
                break
        else:
            chunk_start.unpersist()
    return state.select("id", "pr")
