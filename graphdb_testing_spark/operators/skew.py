"""Skew mitigation: salted joins and salted two-stage aggregation.

At 100 TB a handful of hot keys (a celebrity vertex, a default
``user_id``, an empty string) can pin an entire shuffle behind one
straggler task.  Three escape hatches, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in :mod:`session`) — splits oversized sort-merge
   partitions at runtime; zero code.  Only covers *joins* executed
   as SMJ.
2. **Salting** (this module) — for shuffle-hash joins AQE won't
   split, and for hot-key *aggregations* whose reduce state
   (``collect_list``, large count-distinct) overwhelms one task.
3. **Broadcast** — when the small side fits (``state_hint``).

The reference never needs this (shared-memory atomics don't care
about key distribution — e.g. the for-all-edges loops of
``src/alg/static_components.c``), but its R-MAT generator emits a
power-law degree distribution (A=0.55 quadrant bias,
``rmatter/src/rmatter.c:71-118``), which is exactly the skew that
breaks naive shuffles at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    # deterministic per-row salt (hash of the whole row) — stable
    # across retries, unlike rand(); distinct payloads under a hot
    # key spread uniformly
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed ``left`` against a non-broadcastable
    ``right``, splitting every hot key across ``n_salts`` reduce
    tasks: left rows get a deterministic salt, right rows are
    replicated once per salt value, and the join key becomes
    ``on + [salt]``.

    Cost model: right side is scanned/shuffled ``n_salts`` times —
    use only when right is far smaller than left's hot keys are deep.
    ``how`` is limited to ``inner``/``left``/``left_semi``/
    ``left_anti``: right-preserving joins would emit unmatched right
    rows once per salt.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    l_salted = left.withColumn(_SALT, _row_salt(left, n_salts))
    r_salted = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, on + [_SALT], how).drop(_SALT)


#: decomposable aggregate → (partial fn, final fn) — partial runs per
#: (keys, salt), final re-combines per keys; COUNT finalizes as SUM
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage group-by for hot grouping keys: partial aggregate
    per ``(keys, salt)``, then final combine per ``keys``.

    ``aggs`` is ``[(column, fn, alias)]`` with ``fn`` one of
    ``sum/count/min/max`` (decomposable — the two-stage result is
    exactly the one-stage result).  Spark's hash aggregate already
    map-side combines, so this only wins when a single reduce key's
    state is itself too big for one task; for plain counts prefer
    the built-in aggregate and let AQE coalesce.
    """
    for _, fn, _ in aggs:
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{fn!r} is not decomposable-safe")
    partial = (
        df.withColumn(_SALT, _row_salt(df, n_salts))
        .groupBy(*keys, _SALT)
        .agg(
            *[
                _DECOMPOSABLE[fn][0](c).alias(alias)
                for c, fn, alias in aggs
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](alias).alias(alias)
            for _, fn, alias in aggs
        ]
    )
