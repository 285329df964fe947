"""Sketch-based approximate queries with exact (bit-identical)
DuckDB oracles: the sketch state is deterministic on the portable
hash, so even the *estimate* is hash-checkable — the correctness gate
covers the approximation machinery itself, not just an exact twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datasets
from .functions import sketches
from .queries import register

# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type (deterministic registers)
# ---------------------------------------------------------------------------

_HLL_ORACLE = (
    "WITH "
    + sketches.hll_oracle_sql("events", "event_type", "user_id").strip()
    + """,
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact, h.est_milli
FROM exact e JOIN hll h USING (event_type)
"""
)


@register("hll_distinct_users", _HLL_ORACLE)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, exact vs the 64-register
    HyperLogLog estimate (:mod:`functions.sketches`).  The register
    state is a map-side-combining ``groupBy(key, register).max`` —
    at 100 TB the shuffle carries ≤ 64 rows per key while the exact
    countDistinct re-shuffles every raw value; the oracle checks the
    estimate bit-for-bit because the hash, the rank ladder, and the
    Σ2^-rho arithmetic are all engine-exact."""
    ev = datasets.load_table(spark, sf_dir, "events")
    regs = sketches.hll_registers(ev, ["event_type"], "user_id")
    est = sketches.hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "est_milli"
    )
