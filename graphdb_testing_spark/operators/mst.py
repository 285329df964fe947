"""Minimum spanning forest — Borůvka rounds.

The reference's analytics pack stops at connectivity kernels
(``static_components.c``); a spanning-forest kernel is the natural
weighted completion and Borůvka is *the* distributed MST algorithm:
every round each component picks its minimum-weight outgoing edge and
the chosen edges merge components, so the component count at least
halves per round — O(log n) rounds total, each round a constant
number of key-partitioned joins and one partial aggregation.  (Same
round structure GraphX's and Pregel-style MST implementations use.)

Determinism: edge order is the total order ``(w, u, v)`` (weights
tie-broken by the canonical endpoint pair), which makes the chosen
forest unique and therefore oracle-checkable — the DuckDB side
unrolls the identical rounds with a per-round recursive-closure
contraction.

Scale design: the only O(ne) relation is the canonical edge list;
per-round state is one (id, lab) table that joins by key (broadcast
under :data:`~graphdb_testing_spark.operators.util.BROADCAST_STATE_MAX_ROWS`,
shuffle-hash above).  The min-edge selection is a ``groupBy(label)``
over a 2×-exploded incidence view — map-side combinable, no window,
no driver-side edge data.  Contraction runs the existing
:func:`~graphdb_testing_spark.operators.components.connected_components`
kernel on the *label* graph, whose size is the current component
count (≤ nv, halving each round), never the edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .util import state_hint


def boruvka_msf(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """``(u, v, w, round)`` — the minimum spanning forest of the
    undirected weighted graph, built in bounded Borůvka rounds.

    ``edges``: symmetric ``(src, dst, wgt)`` as produced by
    :func:`graph.symmetrize`.  Rounds beyond the fixpoint are no-ops
    (no cross-component edges remain), so a converged run returns the
    full forest; a non-converged run returns the partial forest whose
    rounds both sides (engine and oracle) agree on exactly.
    """
    canon = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("wgt").cast("long").alias("w"),
        )
        .distinct()
        .localCheckpoint()
    )
    lab = (
        canon.select(F.col("u").alias("id"))
        .unionAll(canon.select(F.col("v").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("lab"))
        .localCheckpoint()
    )
    nv = lab.count()
    chosen_rounds: list[DataFrame] = []

    for r in range(1, rounds + 1):
        lu = state_hint(lab.select(F.col("id").alias("u"), F.col("lab").alias("lu")), nv)
        lv = state_hint(lab.select(F.col("id").alias("v"), F.col("lab").alias("lv")), nv)
        cross = (
            canon.join(lu, "u").join(lv, "v").filter(F.col("lu") != F.col("lv"))
        )
        # min outgoing edge per component, total order (w, u, v)
        inc = cross.select(
            F.col("lu").alias("l"), "w", "u", "v", "lu", "lv"
        ).unionAll(cross.select(F.col("lv").alias("l"), "w", "u", "v", "lu", "lv"))
        sel = inc.groupBy("l").agg(
            F.min(F.struct("w", "u", "v", "lu", "lv")).alias("m")
        )
        chosen = (
            sel.select("m.w", "m.u", "m.v", "m.lu", "m.lv")
            .distinct()
            .localCheckpoint()
        )
        if chosen.isEmpty():
            break
        chosen_rounds.append(
            chosen.select("u", "v", "w", F.lit(r).cast("long").alias("round"))
        )
        # contract: CC over the LABEL graph (size = component count)
        lpairs = chosen.select(
            F.col("lu").alias("src"), F.col("lv").alias("dst")
        ).unionAll(chosen.select(F.col("lv").alias("src"), F.col("lu").alias("dst")))
        remap = connected_components(lpairs).select(
            F.col("id").alias("lab"), F.col("label").alias("nlab")
        )
        lab = (
            lab.join(state_hint(remap, nv), "lab", "left")
            .select("id", F.coalesce("nlab", "lab").alias("lab"))
            .localCheckpoint()
        )

    spark = edges.sparkSession
    if not chosen_rounds:
        return spark.createDataFrame([], "u long, v long, w long, round long")
    out = chosen_rounds[0]
    for d in chosen_rounds[1:]:
        out = out.unionAll(d)
    return out


def msf_oracle_sql(edge_view: str, rounds: int = 6) -> str:
    """DuckDB unroll of the same rounds over ``edge_view`` (symmetric
    ``src, dst, wgt``).  Final relation ``msf_result(u, v, w, round)``.
    Contraction is a per-round recursive closure over the chosen
    label pairs (min reachable label — the same min-label contraction
    the engine's CC kernel computes).  Requires ``WITH RECURSIVE`` at
    the call site.
    """
    ctes = [
        f"""mcanon AS MATERIALIZED (
  SELECT DISTINCT src AS u, dst AS v, CAST(wgt AS BIGINT) AS w
  FROM {edge_view} WHERE src < dst)""",
        """mlab0 AS MATERIALIZED (
  SELECT id, id AS lab FROM (
    SELECT u AS id FROM mcanon UNION SELECT v AS id FROM mcanon))""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""mcross{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, a.lab AS lu, b.lab AS lv
  FROM mcanon e JOIN mlab{p} a ON e.u = a.id JOIN mlab{p} b ON e.v = b.id
  WHERE a.lab <> b.lab)"""
        )
        ctes.append(
            f"""mchosen{r} AS MATERIALIZED (
  SELECT DISTINCT w, u, v, lu, lv FROM (
    SELECT l, w, u, v, lu, lv,
           ROW_NUMBER() OVER (PARTITION BY l ORDER BY w, u, v) AS rn
    FROM (SELECT lu AS l, w, u, v, lu, lv FROM mcross{r}
          UNION ALL
          SELECT lv AS l, w, u, v, lu, lv FROM mcross{r}))
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""mlpair{r} AS (
  SELECT lu AS a, lv AS b FROM mchosen{r}
  UNION SELECT lv, lu FROM mchosen{r})"""
        )
        ctes.append(
            f"""mreach{r}(l, m) AS (
  SELECT a, a FROM mlpair{r}
  UNION
  SELECT r.l, p.b FROM mreach{r} r JOIN mlpair{r} p ON r.m = p.a)"""
        )
        ctes.append(
            f"""mlab{r} AS MATERIALIZED (
  SELECT a.id, COALESCE(n.nl, a.lab) AS lab
  FROM mlab{p} a LEFT JOIN (
    SELECT l, MIN(m) AS nl FROM mreach{r} GROUP BY l) n ON a.lab = n.l)"""
        )
    union = "\n  UNION ALL\n  ".join(
        f"SELECT u, v, w, CAST({r} AS BIGINT) AS round FROM mchosen{r}"
        for r in range(1, rounds + 1)
    )
    ctes.append(f"msf_result AS (\n  {union}\n)")
    return ",\n".join(ctes)
