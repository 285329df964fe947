"""DuckDB oracle SQL fragments.

Each derived view in :mod:`graphdb_testing_spark.datasets` has a CTE
fragment here; ``__spark_entry__.oracle_sql()`` composes them into
standalone ANSI-SQL statements DuckDB runs over the pre-registered
parquet views (``region nation customer supplier part orders lineitem
events documents embeddings``).

Float discipline (so value-hashes match bit-for-bit):

* money sums are aggregated as ``DECIMAL(18,2)`` (exact,
  order-independent) and cast back to DOUBLE at the end;
* PageRank-style iterative doubles are ``ROUND(x, 6)`` on both sides;
* literals use e-notation (``0.85e0``) so DuckDB parses DOUBLE, not
  DECIMAL.
"""

from __future__ import annotations

#: FIXTURES.md §2.1 — part–supplier co-occurrence graph (bipartite,
#: symmetric, weight = multiplicity).  Lockstep with
#: :func:`datasets.part_supplier_graph`.
EDGES_CTE = """
directed AS (
  SELECT l_partkey AS src, l_suppkey + 1099511627776 AS dst, COUNT(*) AS wgt
  FROM lineitem GROUP BY 1, 2
),
edges AS (
  SELECT src, dst, wgt FROM directed
  UNION ALL
  SELECT dst, src, wgt FROM directed
)
"""

#: FIXTURES.md §2.2 — user co-participation graph.  Lockstep with
#: :func:`datasets.user_graph`.
USER_EDGES_CTE = """
upairs AS (
  SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS wgt
  FROM events a JOIN events b
    ON a.event_type = b.event_type
   AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
   AND a.user_id < b.user_id
  GROUP BY 1, 2
),
user_edges AS (
  SELECT src, dst, wgt FROM upairs
  UNION ALL
  SELECT dst, src, wgt FROM upairs
)
"""

#: Typed user co-participation graph (etype = alphabetical dense rank
#: of event_type).  Lockstep with :func:`datasets.typed_user_graph`.
TYPED_EDGES_CTE = """
tmap AS (
  SELECT event_type, DENSE_RANK() OVER (ORDER BY event_type) - 1 AS etype
  FROM (SELECT DISTINCT event_type FROM events)
),
tpairs AS (
  SELECT a.user_id AS src, b.user_id AS dst, t.etype, COUNT(*) AS wgt
  FROM events a JOIN events b
    ON a.event_type = b.event_type
   AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
   AND a.user_id < b.user_id
  JOIN tmap t ON t.event_type = a.event_type
  GROUP BY 1, 2, 3
),
typed_edges AS (
  SELECT src, dst, wgt, etype FROM tpairs
  UNION ALL
  SELECT dst, src, wgt, etype FROM tpairs
)
"""


def with_typed_edges(body: str, extra_ctes: str = "") -> str:
    ctes = TYPED_EDGES_CTE.strip()
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    return f"WITH {ctes}\n{body}"


#: Directed orientation of the user co-participation graph (one edge
#: per pair, direction = portable md5 draw).  Lockstep with
#: :func:`datasets.directed_user_graph`.
DIRECTED_EDGES_CTE = """
dpairs AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM events a JOIN events b
    ON a.event_type = b.event_type
   AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
   AND a.user_id < b.user_id
),
dedges AS (
  SELECT CASE WHEN ('0x' || substr(md5('dir|' || u::VARCHAR || '|' || v::VARCHAR), 1, 8))::BIGINT % 2 = 1
              THEN v ELSE u END AS src,
         CASE WHEN ('0x' || substr(md5('dir|' || u::VARCHAR || '|' || v::VARCHAR), 1, 8))::BIGINT % 2 = 1
              THEN u ELSE v END AS dst
  FROM dpairs
)
"""


def with_directed_edges(body: str, extra_ctes: str = "", recursive: bool = False) -> str:
    ctes = DIRECTED_EDGES_CTE.strip()
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} {ctes}\n{body}"


#: FIXTURES.md §2.3 — complement-encoded action stream.  Lockstep with
#: :func:`datasets.actions_stream`.
ACTIONS_CTE = """
actions AS (
  SELECT event_id AS seq,
         CASE WHEN event_id % 16 = 0 THEN -(user_id + 1) ELSE user_id END AS src,
         CASE WHEN event_id % 16 = 0 THEN -((event_id % 997) + 1)
              ELSE event_id % 997 END AS dst,
         CAST(1 AS BIGINT) AS weight,
         ts
  FROM events
)
"""


def cc_bounded_ctes(
    edge_view: str, rounds: int = 8, out: str = "lab", suffix: str = ""
) -> str:
    """Unrolled min-label-propagation CTE chain over a SYMMETRIC edge
    view — O(rounds·|E|) work instead of the O(|V|·|E|) row space of
    the transitive-closure ``reach`` idiom (which is exact but
    infeasible past sf0.01; round-3 verdict item 5).

    Each round is one hop (min over self ∪ in-neighbors' labels)
    followed by one pointer jump (``label := label(label)``, valid
    because labels are vertex ids), so covered distance doubles per
    round: 8 rounds reach components of diameter ≥ 2⁸.  Emits
    ``{out}{suffix}(id, label)`` with label = component min id — the
    same fixpoint as ``reach``.

    **Convergence is asserted, not assumed**: if the last two rounds
    differ anywhere, a poison row ``(-424242421, -1)`` is appended,
    which can never match the Spark side — an under-provisioned
    ``rounds`` fails the comparison loudly instead of silently
    shipping a non-fixpoint."""
    s = suffix
    parts = [
        f"ccl{s}0 AS MATERIALIZED ("
        f"SELECT DISTINCT src AS id, src AS label FROM {edge_view})"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""cclh{s}{r} AS MATERIALIZED (
  SELECT id, MIN(label) AS label FROM (
    SELECT id, label FROM ccl{s}{r - 1}
    UNION ALL
    SELECT e.dst AS id, l.label
    FROM {edge_view} e JOIN ccl{s}{r - 1} l ON l.id = e.src
  ) GROUP BY id
)"""
        )
        parts.append(
            f"""ccl{s}{r} AS MATERIALIZED (
  SELECT h.id, LEAST(h.label, j.label) AS label
  FROM cclh{s}{r} h JOIN cclh{s}{r} j ON j.id = h.label
)"""
        )
    parts.append(
        f"""{out}{s} AS (
  SELECT id, label FROM ccl{s}{rounds}
  UNION ALL
  SELECT CAST(-424242421 AS BIGINT), CAST(-1 AS BIGINT)
  FROM (SELECT 1 FROM ccl{s}{rounds} a
        JOIN ccl{s}{rounds - 1} b ON a.id = b.id AND a.label <> b.label
        LIMIT 1)
)"""
    )
    return ",\n".join(parts)


def with_edges(body: str, extra_ctes: str = "") -> str:
    """Compose a full query: ``WITH <edges views>[, extra] <body>``."""
    ctes = EDGES_CTE.strip()
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    return f"WITH {ctes}\n{body}"


def with_user_edges(body: str, extra_ctes: str = "") -> str:
    ctes = USER_EDGES_CTE.strip()
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    return f"WITH {ctes}\n{body}"


#: Typed vertex table (vtype = dense rank of the user's dominant
#: event type, ties to the alphabetically first type).  Lockstep with
#: :func:`datasets.typed_vertices` — the reference's per-vertex type
#: slot (``tests/stinger/include/stinger.h:143-149``).
TYPED_VERTICES_CTE = """
vtmap AS (
  SELECT event_type, DENSE_RANK() OVER (ORDER BY event_type) - 1 AS vtype
  FROM (SELECT DISTINCT event_type FROM events)
),
vdom AS (
  SELECT user_id AS id, event_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type)
  WHERE rn = 1
),
vertices AS (
  SELECT d.id, CAST(m.vtype AS BIGINT) AS vtype
  FROM vdom d JOIN vtmap m ON d.event_type = m.event_type
)
"""


def with_typed_vertices(body: str, extra_ctes: str = "") -> str:
    """user_edges + the typed vertex table, for vtype-filtered
    queries (the reference's active-vtype logic)."""
    ctes = USER_EDGES_CTE.strip() + ",\n" + TYPED_VERTICES_CTE.strip()
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    return f"WITH {ctes}\n{body}"
