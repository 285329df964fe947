"""Greedy graph coloring — Jones-Plassmann with id priority, bounded
rounds.

Round law: an uncolored vertex colors itself iff its id is smaller
than every *uncolored* neighbor's id (the same winner rule as the
parallel greedy MIS, ``operators/mis.py``); its color is the mex
(minimum excluded value) of its already-colored neighbors' colors.
With id priority the parallel rounds compute exactly the sequential
greedy coloring in id order (Jones & Plassmann, "A parallel graph
coloring heuristic", SIAM J. Sci. Comput. 1993) — every vertex waits
precisely for its smaller-id neighbors, and mex over their final
colors is order-independent.

Spark shape per round: one semi-filtered min-aggregation to find
winners, one join against the colored state to gather neighbor
colors, and a JVM-side mex via ``aggregate(sort_array(...))`` — no
Python in the loop, state is O(uncolored) and shrinks every round.
Bounded rounds keep it oracle-checkable (DuckDB unrolls the same
rounds; mex is a lateral ``generate_series`` anti-join there); a
``color = -1`` residue reports non-convergence honestly.

Reference analog: vertex-partitioned greedy coloring is the classic
STINGER-era independent-set schedule (cf. ``tests/stinger``'s
kernel suite); re-expressed here as per-round DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import state_hint

# mex of a collected color set: walk the sorted distinct colors with
# an integer accumulator; the first gap freezes the accumulator.
_MEX = (
    "aggregate(sort_array(array_distinct(cs)), 0, "
    "(acc, x) -> IF(x = acc, acc + 1, acc))"
)


def greedy_coloring(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(id, color)`` over a symmetric edge table.  Colors are dense
    small ints (the greedy sequential coloring by id order once
    converged); ``-1`` marks vertices still uncolored after
    ``rounds``."""
    verts = edges.select(F.col("src").alias("id")).distinct().localCheckpoint()
    unc = verts
    n_unc = unc.count()
    e = edges.select("src", "dst").localCheckpoint()
    colored = None  # (id, color)

    for _ in range(rounds):
        if n_unc == 0:
            break
        e_unc = (
            e.join(state_hint(unc.select(F.col("id").alias("src")), n_unc), "src", "semi")
            .join(state_hint(unc.select(F.col("id").alias("dst")), n_unc), "dst", "semi")
            .select("src", "dst")
        )
        min_nbr = e_unc.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("mn"))
        winners = (
            unc.join(state_hint(min_nbr, n_unc), "id", "left")
            .filter(F.col("mn").isNull() | (F.col("id") < F.col("mn")))
            .select("id")
            .localCheckpoint()
        )
        n_win = winners.count()
        if colored is None:
            new_colors = winners.select("id", F.lit(0).cast("long").alias("color"))
        else:
            nbr_colors = (
                e.join(
                    state_hint(winners.select(F.col("id").alias("src")), n_win),
                    "src",
                    "semi",
                )
                .join(
                    colored.select(
                        F.col("id").alias("dst"), F.col("color").alias("nc")
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"))
                .agg(F.collect_set("nc").alias("cs"))
            )
            new_colors = (
                winners.join(nbr_colors, "id", "left")
                .select(
                    "id",
                    F.when(F.col("cs").isNull(), F.lit(0))
                    .otherwise(F.expr(_MEX))
                    .cast("long")
                    .alias("color"),
                )
            )
        new_colors = new_colors.localCheckpoint()
        colored = (
            new_colors if colored is None else colored.unionAll(new_colors)
        ).localCheckpoint()
        unc = unc.join(winners, "id", "left_anti").localCheckpoint()
        n_unc = unc.count()

    out = unc.select("id", F.lit(-1).cast("long").alias("color"))
    if colored is not None:
        out = colored.unionAll(out)
    return out


def coloring_oracle_sql(edge_view: str, rounds: int = 6) -> str:
    """DuckDB CTE chain unrolling the same rounds over ``edge_view``
    (symmetric ``src, dst``).  Final relation: ``coloring_result(id,
    color)``.  The mex is a lateral ``generate_series(0, n_nbr)``
    anti-joined against the gathered neighbor colors — a pair within
    the candidate range must exist because only ``n_nbr`` colors are
    excluded."""
    ctes = [
        f"cunc0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM {edge_view})",
        "col0 AS (SELECT id, CAST(0 AS BIGINT) AS color FROM cunc0 WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""cwin{r} AS MATERIALIZED (
  SELECT u.id FROM cunc{p} u LEFT JOIN (
    SELECT e.src AS id, MIN(e.dst) AS mn FROM {edge_view} e
    SEMI JOIN cunc{p} a ON e.src = a.id
    SEMI JOIN cunc{p} b ON e.dst = b.id
    GROUP BY e.src) m USING (id)
  WHERE m.mn IS NULL OR u.id < m.mn
)"""
        )
        ctes.append(
            f"""cnbr{r} AS MATERIALIZED (
  SELECT e.src AS id, c.color FROM {edge_view} e
  JOIN col{p} c ON e.dst = c.id
  SEMI JOIN cwin{r} w ON e.src = w.id
  GROUP BY e.src, c.color
)"""
        )
        ctes.append(
            f"""ccnt{r} AS (SELECT id, COUNT(*) AS n FROM cnbr{r} GROUP BY id)"""
        )
        ctes.append(
            f"""ccand{r} AS MATERIALIZED (
  SELECT id, unnest(range(0, COALESCE(n, 0) + 1)) AS g
  FROM (SELECT w.id, c.n FROM cwin{r} w LEFT JOIN ccnt{r} c USING (id))
)"""
        )
        ctes.append(
            f"""cnew{r} AS MATERIALIZED (
  SELECT a.id, CAST(MIN(a.g) AS BIGINT) AS color FROM ccand{r} a
  ANTI JOIN cnbr{r} n ON a.id = n.id AND a.g = n.color
  GROUP BY a.id
)"""
        )
        ctes.append(
            f"col{r} AS (SELECT id, color FROM col{p} "
            f"UNION ALL SELECT id, color FROM cnew{r})"
        )
        ctes.append(
            f"cunc{r} AS MATERIALIZED (SELECT id FROM cunc{p} EXCEPT "
            f"SELECT id FROM cwin{r})"
        )
    ctes.append(
        f"""coloring_result AS (
  SELECT id, color FROM col{rounds}
  UNION ALL
  SELECT id, CAST(-1 AS BIGINT) AS color FROM cunc{rounds}
)"""
    )
    return ",\n".join(ctes)
