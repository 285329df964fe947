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

from ..hashutil import hash_prefix
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


# ---------------------------------------------------------------------------
# Greedy maximal matching — the edge-wise sibling of the vertex MIS
# ---------------------------------------------------------------------------

# Edge priority = portable 60-bit hash of the pair: RANDOM priorities
# give the O(log m) round bound (lexicographic (u,v) priorities
# serialize on dense graphs: one hub edge is the local min everywhere,
# so each round matches O(1) edges).  Collision probability at 60 bits
# is negligible; the oracle uses the identical hash.


def greedy_matching(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(u, v, round)`` — parallel greedy maximal matching over the
    undirected pair list (``src < dst`` orientation of a symmetric
    edge table): each round matches every *locally minimal* edge (the
    lexicographically smallest remaining edge at BOTH endpoints — two
    adjacent edges can't both qualify), then drops the matched
    vertices.  Equals the sequential greedy matching in edge order;
    O(log m) rounds w.h.p. (same analysis as the MIS above — a
    matching IS an independent set in the line graph).

    Per round: one groupBy-min per endpoint + two semi/anti joins;
    state shrinks geometrically."""
    rem = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .withColumn(
            "pr",
            hash_prefix(
                F.concat_ws(
                    "|", F.lit("match"), F.col("u").cast("string"),
                    F.col("v").cast("string")
                ),
                15,
            ),
        )
        .localCheckpoint()
    )
    out = None
    for r in range(1, rounds + 1):
        if rem.isEmpty():
            break
        # per-VERTEX minimum over ALL incident edges (a vertex appears
        # as u in some pairs and as v in others — grouping by one
        # column alone misses half its incidences and can match two
        # adjacent edges)
        inc = rem.select(F.col("u").alias("w"), "pr").unionAll(
            rem.select(F.col("v").alias("w"), "pr")
        )
        m_w = inc.groupBy("w").agg(F.min("pr").alias("mw"))
        matched = (
            rem.join(state_hint(m_w.select(F.col("w").alias("u"), F.col("mw").alias("mu")), None), "u")
            .join(state_hint(m_w.select(F.col("w").alias("v"), F.col("mw").alias("mv")), None), "v")
            .filter((F.col("pr") == F.col("mu")) & (F.col("pr") == F.col("mv")))
            .select("u", "v", F.lit(r).cast("long").alias("round"))
            .localCheckpoint()
        )
        if matched.isEmpty():
            break
        out = matched if out is None else out.unionAll(matched)
        mv = (
            matched.select(F.col("u").alias("x"))
            .unionAll(matched.select(F.col("v").alias("x")))
            .localCheckpoint()
        )
        rem = (
            rem.join(mv.select(F.col("x").alias("u")), "u", "left_anti")
            .join(mv.select(F.col("x").alias("v")), "v", "left_anti")
            .localCheckpoint()
        )
    if out is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "u long, v long, round long")
    return out


def matching_oracle_sql(edge_view: str, rounds: int = 6) -> str:
    """Unrolled DuckDB mirror; final relation ``match_result(u, v,
    round)``."""
    ctes = [
        f"""rem0 AS MATERIALIZED (
  SELECT u, v,
         ('0x' || substr(md5('match|' || u::VARCHAR || '|' || v::VARCHAR),
          1, 15))::BIGINT AS pr
  FROM (
    SELECT DISTINCT src AS u, dst AS v FROM {edge_view} WHERE src < dst))""",
        "mm0 AS (SELECT u, v, 0 AS round FROM rem0 WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""mt{r} AS MATERIALIZED (
  SELECT e.u, e.v, {r} AS round
  FROM rem{p} e
  JOIN (SELECT w, MIN(pr) AS mw FROM (
          SELECT u AS w, pr FROM rem{p}
          UNION ALL SELECT v AS w, pr FROM rem{p}) GROUP BY w) a
    ON a.w = e.u
  JOIN (SELECT w, MIN(pr) AS mw FROM (
          SELECT u AS w, pr FROM rem{p}
          UNION ALL SELECT v AS w, pr FROM rem{p}) GROUP BY w) b
    ON b.w = e.v
  WHERE e.pr = a.mw AND e.pr = b.mw)"""
        )
        ctes.append(
            f"""rem{r} AS MATERIALIZED (
  SELECT * FROM rem{p} e
  WHERE NOT EXISTS (SELECT 1 FROM mt{r} m
                    WHERE m.u IN (e.u, e.v) OR m.v IN (e.u, e.v)))"""
        )
        ctes.append(
            f"mm{r} AS (SELECT u, v, round FROM mm{p}"
            f" UNION ALL SELECT u, v, round FROM mt{r})"
        )
    ctes.append(
        f"match_result AS (SELECT u, v, CAST(round AS BIGINT) AS round FROM mm{rounds})"
    )
    return ",\n".join(ctes)
