"""Deterministic distributed sketches (HyperLogLog-style distinct
counting) built on the portable md5 hash (:mod:`hashutil`), so the
sketch state — and therefore the estimate — is bit-identical between
Spark and the DuckDB oracle.

Design notes (Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AMS 2007):

* 32-bit portable hash → low ``log2(m)`` bits pick the register, the
  remaining 26 bits feed the rank (leading-pattern) function.
* ``rho`` is computed with an integer CASE ladder on powers of two —
  never ``floor(log2(w))`` — because libm rounding may differ between
  the JVM and DuckDB while integer comparisons cannot.
* The register state is a ``groupBy(key, register).max(rho)`` — a
  map-side-combining partial aggregate, which is the whole point at
  100 TB: the shuffle carries at most ``m`` rows per key, never the
  raw values.  This is the same merge law real HLL sinks use
  (register-wise max is associative + commutative).
* The estimate stays on the raw-HLL path (no small/large-range
  corrections): corrections need ``ln``/``log`` whose last-ulp
  behavior is libm-specific, and the oracle contract demands
  bit-equality.  Σ 2^-rho is a sum of ≤ m exact powers of two ⇒
  exactly representable ⇒ order-independent, so the distributed
  aggregation is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashutil import hash_prefix

#: m = 64 registers → 6 register bits, 26 rank bits, alpha_64 = 0.709.
HLL_M = 64
HLL_ALPHA = 0.709
_RANK_BITS = 26


def _bit_len(w: Column) -> Column:
    """Integer bit length of ``w`` (< 2^26) via a comparison ladder —
    exact on any engine, no libm."""
    c = F.when(w >= F.lit(1 << (_RANK_BITS - 1)), F.lit(_RANK_BITS))
    for k in range(_RANK_BITS - 1, 0, -1):
        c = c.when(w >= F.lit(1 << (k - 1)), F.lit(k))
    return c.otherwise(F.lit(0))


def _bit_len_sql(expr: str) -> str:
    """The same ladder as ANSI SQL text (DuckDB oracle side)."""
    branches = "\n".join(
        f"  WHEN {expr} >= {1 << (k - 1)} THEN {k}"
        for k in range(_RANK_BITS, 0, -1)
    )
    return f"(CASE\n{branches}\n  ELSE 0 END)"


def hll_rho(value: Column, salt: str = "hll") -> tuple[Column, Column]:
    """``(register, rho)`` for one value: register = low 6 hash bits,
    rho = 1 + number of leading zeros of the remaining 26 bits
    (∈ [1, 27])."""
    h = hash_prefix(F.concat_ws("|", F.lit(salt), value.cast("string")), 8)
    reg = F.pmod(h, F.lit(HLL_M)).cast("long")
    w = (h / F.lit(HLL_M)).cast("long")  # h div 64: h >= 0 so trunc == floor
    rho = (F.lit(_RANK_BITS + 1) - _bit_len(w)).cast("long")
    return reg, rho


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str, salt: str = "hll"
) -> DataFrame:
    """Per-key HLL register state ``(key..., register, max_rho)`` —
    the mergeable sketch (register-wise max)."""
    reg, rho = hll_rho(F.col(value_col), salt)
    return (
        df.withColumn("register", reg)
        .withColumn("rho", rho)
        .groupBy(*key_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Raw-HLL estimate per key from the register state, as the exact
    integer ``est_milli = floor(1000 · α·m²/Σ2^-M_j)`` (empty
    registers contribute 2^0 = 1 each)."""
    per_key = registers.groupBy(*key_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("sum_pow"),
    )
    s = (F.lit(HLL_M) - F.col("n_regs")).cast("double") + F.col("sum_pow")
    est = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / s
    return per_key.select(
        *key_cols, F.floor(est * F.lit(1000.0)).cast("long").alias("est_milli")
    )


def hll_oracle_sql(
    table: str, key_cols: str, value_expr: str, salt: str = "hll"
) -> str:
    """DuckDB SQL computing the identical register state + estimate."""
    h = (
        f"('0x' || substr(md5('{salt}|' || CAST({value_expr} AS VARCHAR)),"
        " 1, 8))::BIGINT"
    )
    return f"""
hashed AS (
  SELECT {key_cols}, {h} % {HLL_M} AS register,
         CAST({_RANK_BITS + 1} - {_bit_len_sql(f"({h} // {HLL_M})")} AS BIGINT) AS rho
  FROM {table}
),
regs AS (
  SELECT {key_cols}, register, MAX(rho) AS max_rho
  FROM hashed GROUP BY {key_cols}, register
),
hll AS (
  SELECT {key_cols},
         CAST(FLOOR(1000.0 * {HLL_ALPHA} * {HLL_M * HLL_M} /
           (({HLL_M} - COUNT(*)) + SUM(POWER(2e0, -max_rho)))) AS BIGINT)
           AS est_milli
  FROM regs GROUP BY {key_cols}
)
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
# ---------------------------------------------------------------------------


def cms_counters(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 512, salt: str = "cms"
) -> DataFrame:
    """``(r, idx, cnt)`` Count-Min counter table: each item increments
    one counter per hash row ``r``.  Build is one map-side explode of
    ``depth`` rows followed by a ≤ depth·width-group partial-agg
    shuffle — the sketch size is constant no matter how many items
    stream through, which is the whole point at 100 TB.  Merging two
    sketches is counter-wise addition (same groupBy), so per-partition
    sketches combine losslessly."""
    from ..hashutil import hash_prefix

    rows = df.select(
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
        F.col(item_col).cast("string").alias("item"),
    )
    idx = F.pmod(
        hash_prefix(
            F.concat_ws("|", F.lit(salt), F.col("r").cast("string"), F.col("item")), 8
        ),
        F.lit(width),
    )
    return rows.select("r", idx.alias("idx")).groupBy("r", "idx").agg(
        F.count("*").alias("cnt")
    )


def cms_point_estimates(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """min-over-rows point estimate for each probe item (CMS
    guarantees estimate ≥ true count).  ``probes`` is small (a
    heavy-hitter shortlist): it explodes to ``depth`` rows, joins the
    counter table on ``(r, idx)`` and takes the row-minimum."""
    from ..hashutil import hash_prefix

    pr = probes.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    ).select(
        item_col,
        "r",
        F.pmod(
            hash_prefix(
                F.concat_ws(
                    "|", F.lit(salt), F.col("r").cast("string"),
                    F.col(item_col).cast("string"),
                ),
                8,
            ),
            F.lit(width),
        ).alias("idx"),
    )
    return (
        pr.join(counters, ["r", "idx"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(item_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


def cms_oracle_sql(
    table: str, item_expr: str, depth: int = 4, width: int = 512, salt: str = "cms"
) -> str:
    """DuckDB CTE chain: ``cms_counters(r, idx, cnt)`` built with the
    identical md5-prefix hash (`hashutil` contract)."""
    return f"""cms_rows AS (
  SELECT t.r, CAST({item_expr} AS VARCHAR) AS item
  FROM {table}, UNNEST([{", ".join(str(r) for r in range(depth))}]) t(r)
),
cms_counters AS (
  SELECT r,
         ('0x' || substr(md5('{salt}|' || r::VARCHAR || '|' || item), 1, 8))::BIGINT
           % {width} AS idx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cms_rows GROUP BY 1, 2
)"""
