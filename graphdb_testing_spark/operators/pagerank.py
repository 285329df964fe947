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
* Vertex state is the single-column **pre-divided rank**
  ``prd[v] = pr[v] / degree[v]`` so each round references the
  evolving state exactly ONCE: messages aggregate ``sum(prd)`` over
  neighbors, and the new state joins the messages against the
  *constant* degree table — never back against the old state.  With
  one self-reference per round the unrolled lazy plan grows
  **linearly** in the unroll factor (state-referenced-twice designs
  grow 2^k and stall Catalyst analysis beyond ~6 rounds).
* A round is one ``edges ⋈ state`` broadcast join + partially
  aggregated ``groupBy(src).sum`` — the big edge side never moves
  (pre-partitioned on ``src``; see :meth:`Graph.canonical`), only the
  O(nv) state shuffles/broadcasts.
* ``unroll`` rounds compose into one lazy plan materialized by a
  single eager ``localCheckpoint`` (truncates lineage; driver job
  scheduling is the per-round floor, so fewer/bigger jobs win).
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
    unroll: int = 10,  # linear plan growth ⇒ large unrolls pay off;
    # measured on local[32] at sf0.1: 10 ≈ 2× faster than 5, 20 is
    # marginally better still but delays the first convergence check
) -> DataFrame:
    """``(id, pr)`` PageRank over a symmetric edge table.

    ``num_iter`` forces an exact iteration count with no convergence
    test (used for the unrolled-SQL DuckDB oracle); otherwise the loop
    stops when the chunk L1 delta ≤ ``tol``, like the reference
    (``static_pagerank.c:295-298`` — whose ``iter`` is never
    decremented, so epsilon is the only real exit there too).
    """
    e = edges.select("src", "dst")
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .localCheckpoint()
    )
    nv = deg.count()
    base = (1.0 - damping) / nv
    deg_b = state_hint(deg, nv)

    # state: (id, prd) with prd = pr / degree
    state = deg.select(
        "id", (F.lit(1.0 / nv) / F.col("degree")).alias("prd")
    ).localCheckpoint()

    def to_pr(s: DataFrame) -> DataFrame:
        return s.join(deg_b, "id").select(
            "id", (F.col("prd") * F.col("degree")).alias("pr")
        )

    total = num_iter if num_iter is not None else max_iter
    done = 0
    while done < total:
        k = min(unroll, total - done)
        chunk_start = state
        for _ in range(k):
            # broadcast the O(nv) state so the big edge side never
            # moves; the groupBy then shuffles only partial aggregates
            msgs = (
                e.join(state_hint(state, nv), e.dst == state.id)
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("prd").alias("mass"))
            )
            state = deg_b.join(state_hint(msgs, nv), "id", "left").select(
                "id",
                (
                    (F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                    / F.col("degree")
                ).alias("prd"),
            )
        state = state.localCheckpoint()  # one job: materialize k rounds
        done += k
        if num_iter is None:
            # L1 delta in pr space: |pr - pr0| = |prd - prd0| * degree
            delta = (
                state.join(
                    chunk_start.select("id", F.col("prd").alias("prd0")), "id"
                )
                .join(deg_b, "id")
                .agg(
                    F.sum(
                        F.abs(F.col("prd") - F.col("prd0")) * F.col("degree")
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            chunk_start.unpersist()
            if delta is not None and delta <= tol:
                break
        else:
            chunk_start.unpersist()
    out = to_pr(state)
    deg.unpersist()
    return out
