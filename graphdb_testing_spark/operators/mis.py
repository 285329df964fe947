"""Maximal independent set — parallel greedy by id-priority (the
deterministic special case of Luby's algorithm where the permutation
is the vertex id), bounded rounds.

Round law: an undecided vertex enters the MIS iff its id is smaller
than every *undecided* neighbor's id; neighbors of new MIS vertices
are excluded.  With ids that are hash-uncorrelated with structure
this terminates in O(log n) rounds w.h.p. (Blelloch/Fineman/Shun,
"Greedy sequential maximal independent set ... can be parallel", SPAA
'12 — the parallel rounds compute exactly the sequential greedy MIS).

Spark shape: each round = one semi-filtered edge relation, one
``groupBy(src).min(dst)``, two anti-joins — all key-partitioned;
state is O(undecided) and shrinks geometrically.  Bounded rounds keep
the op oracle-checkable (the DuckDB side unrolls the same rounds), a
``status = -1`` residue reports non-convergence honestly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import state_hint


def greedy_mis(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(id, status)`` over a symmetric edge table: 1 = in the MIS,
    0 = dominated (has an MIS neighbor), -1 = undecided after
    ``rounds`` (empty at fixpoint)."""
    verts = edges.select(F.col("src").alias("id")).distinct().localCheckpoint()
    und = verts
    n_und = und.count()
    decided: list[DataFrame] = []
    e = edges.select("src", "dst").localCheckpoint()

    for _ in range(rounds):
        if n_und == 0:
            break
        e_und = (
            e.join(state_hint(und.select(F.col("id").alias("src")), n_und), "src", "semi")
            .join(state_hint(und.select(F.col("id").alias("dst")), n_und), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        min_nbr = e_und.groupBy(F.col("src").alias("id")).agg(
            F.min("dst").alias("mn")
        )
        winners = (
            und.join(state_hint(min_nbr, n_und), "id", "left")
            .filter(F.col("mn").isNull() | (F.col("id") < F.col("mn")))
            .select("id")
            .localCheckpoint()
        )
        n_win = winners.count()
        decided.append(winners.select("id", F.lit(1).cast("long").alias("status")))
        losers = (
            e_und.join(
                state_hint(winners.select(F.col("id").alias("dst")), n_win),
                "dst",
                "semi",
            )
            .select(F.col("src").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        decided.append(losers.select("id", F.lit(0).cast("long").alias("status")))
        und = (
            und.join(winners, "id", "left_anti")
            .join(losers, "id", "left_anti")
            .localCheckpoint()
        )
        n_und = und.count()

    out = und.select("id", F.lit(-1).cast("long").alias("status"))
    for d in decided:
        out = out.unionAll(d)
    return out


def mis_oracle_sql(edge_view: str, rounds: int = 6) -> str:
    """DuckDB CTE chain unrolling the same rounds over ``edge_view``
    (symmetric ``src, dst``).  Final relation: ``mis_result(id,
    status)``."""
    ctes = [
        f"und0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM {edge_view})",
        "mis0 AS (SELECT id FROM und0 WHERE FALSE)",
        "out0 AS (SELECT id FROM und0 WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""win{r} AS MATERIALIZED (
  SELECT u.id FROM und{p} u LEFT JOIN (
    SELECT e.src AS id, MIN(e.dst) AS mn FROM {edge_view} e
    SEMI JOIN und{p} a ON e.src = a.id
    SEMI JOIN und{p} b ON e.dst = b.id
    GROUP BY e.src) m USING (id)
  WHERE m.mn IS NULL OR u.id < m.mn
)"""
        )
        ctes.append(
            f"""lose{r} AS MATERIALIZED (
  SELECT DISTINCT e.src AS id FROM {edge_view} e
  SEMI JOIN win{r} w ON e.dst = w.id
  SEMI JOIN und{p} u ON e.src = u.id
)"""
        )
        ctes.append(f"mis{r} AS (SELECT id FROM mis{p} UNION ALL SELECT id FROM win{r})")
        ctes.append(
            f"out{r} AS (SELECT id FROM out{p} UNION ALL "
            f"SELECT id FROM lose{r} EXCEPT SELECT id FROM win{r})"
        )
        ctes.append(
            f"und{r} AS MATERIALIZED (SELECT id FROM und{p} EXCEPT "
            f"SELECT id FROM win{r} EXCEPT SELECT id FROM lose{r})"
        )
    ctes.append(
        f"""mis_result AS (
  SELECT id, CAST(1 AS BIGINT) AS status FROM mis{rounds}
  UNION ALL
  SELECT id, CAST(0 AS BIGINT) AS status FROM out{rounds}
  UNION ALL
  SELECT id, CAST(-1 AS BIGINT) AS status FROM und{rounds}
)"""
    )
    return ",\n".join(ctes)
