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

Spark-first design: vertex state ``(id, degree, pr)`` is one O(nv)
DataFrame; a round is one ``edges ⋈ state`` join + partial-aggregated
``groupBy(src).sum`` — the big edge side stays put (pre-partitioned on
``src``), only the state shuffles, and Catalyst broadcasts the state
when small.  The L1 delta is computed in the same pass that builds the
new state (one extra column), so convergence costs no extra join —
SURVEY.md §7 hard-part (b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    num_iter: int | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """``(id, pr)`` PageRank over a symmetric edge table.

    ``num_iter`` forces an exact iteration count with no convergence
    test (used for the unrolled-SQL DuckDB oracle); otherwise the loop
    stops when the L1 delta ≤ ``tol``, like the reference
    (``static_pagerank.c:295-298`` — whose ``iter`` is never
    decremented, so epsilon is the only real exit there too).
    """
    e = edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree")).persist()
    nv = deg.count()
    base = (1.0 - damping) / nv
    state = deg.withColumn("pr", F.lit(1.0 / nv)).persist()
    state.count()
    deg.unpersist()

    iters = num_iter if num_iter is not None else max_iter
    for it in range(iters):
        contribs = (
            e.join(state, e.dst == state.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("pr") / F.col("degree")).alias("mass"))
        )
        new_state = (
            state.join(contribs, "id", "left")
            .select(
                "id",
                "degree",
                (F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias(
                    "new_pr"
                ),
                F.col("pr").alias("old_pr"),
            )
            .withColumn("pr", F.col("new_pr"))
            .select("id", "degree", "pr", F.abs(F.col("pr") - F.col("old_pr")).alias("d1"))
        )
        if (it + 1) % checkpoint_every == 0:
            # eager local checkpoint: materializes AND truncates lineage,
            # else 100 rounds of joins overflow plan processing
            new_state = new_state.localCheckpoint()
        else:
            new_state = new_state.persist()
        delta = new_state.agg(F.sum("d1").alias("delta")).collect()[0]["delta"]
        state.unpersist()
        state = new_state.select("id", "degree", "pr")
        if num_iter is None and delta <= tol:
            break
    return state.select("id", "pr")
