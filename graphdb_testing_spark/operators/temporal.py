"""Temporal joins the reference lacks but a training-data pipeline
needs: as-of (point-in-time) join and interval/range join.

The reference's closest surface is the per-edge ``timeFirst`` /
``timeRecent`` range predicates (``include/stinger.h:312-315``,
``include/core/stinger-iterator.h:38-68``) — point-in-time lookups
against a history are out of its scope.  Both operators here are pure
DataFrame compositions (no UDFs, single shuffle each), designed so the
physical plan survives a 100× scale-up:

* :func:`asof_join` — the union-then-window formulation: one shuffle
  on the key columns, one in-partition sort, ``last(..., ignorenulls)``
  carries the most recent right-side payload forward.  Never builds
  the (left × right-history) blow-up an inequality join would.
* :func:`range_join` — interval bucketing: each interval is exploded
  to the fixed-width time buckets it covers, the join is a plain
  equi-join on (keys, bucket) that Catalyst shuffles/broadcasts like
  any other, and the exact containment predicate filters afterwards.
  This avoids BroadcastNestedLoopJoin, which is the plan Spark would
  otherwise pick for a pure inequality condition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_time"
_TIE = "__asof_tie"
_RPREFIX = "__asof_r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tiebreak: tuple[str, str] | None = None,
    strict: bool = False,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the most recent
    right row with the same ``on`` keys and ``right_time <=``
    (``<`` when ``strict``) ``left_time``.

    ``value_cols``
        right-side columns to carry over (NULL when no match).
    ``tiebreak``
        optional ``(left_col, right_col)`` pair appended to the time
        ordering so rows with equal timestamps have a total order
        (and ``strict`` compares lexicographically on
        ``(time, tiebreak)``).
    ``tolerance_us``
        when set, matches older than this many microseconds are
        nulled out (pandas ``merge_asof(tolerance=...)`` semantics).

    Implementation: tag both sides, ``unionByName``, then one window
    pass per partition key ordered by ``(time, tiebreak, side)`` with
    ``last(value, ignorenulls=True)``.  Right rows sort *before* left
    rows at an equal sort key for inclusive semantics, *after* for
    strict — so the window frame ``unboundedPreceding..currentRow``
    naturally expresses both.
    """
    on = list(on)
    # side ordering at equal (time, tiebreak): inclusive → right first
    right_side, left_side = (0, 1) if not strict else (1, 0)

    r_cols = [
        *[F.col(c) for c in on],
        F.col(right_time).alias(_TIME),
        *[F.col(c).alias(_RPREFIX + c) for c in value_cols],
    ]
    if tiebreak is not None:
        r_cols.append(F.col(tiebreak[1]).alias(_TIE))
    r = right.select(*r_cols).withColumn(_SIDE, F.lit(right_side))

    l = left.withColumn(_TIME, F.col(left_time)).withColumn(_SIDE, F.lit(left_side))
    if tiebreak is not None:
        l = l.withColumn(_TIE, F.col(tiebreak[0]))

    order = [_TIME, _TIE, _SIDE] if tiebreak is not None else [_TIME, _SIDE]
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched_time = F.last(
        F.when(F.col(_SIDE) == right_side, F.col(_TIME)), ignorenulls=True
    ).over(w)
    out = u.withColumn("__asof_mtime", matched_time)
    for c in value_cols:
        out = out.withColumn(
            _RPREFIX + c, F.last(_RPREFIX + c, ignorenulls=True).over(w)
        )

    out = out.filter(F.col(_SIDE) == left_side)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col(_TIME)) - F.unix_micros(F.col("__asof_mtime"))
        ) <= F.lit(tolerance_us)
        for c in value_cols:
            out = out.withColumn(
                _RPREFIX + c, F.when(in_tol, F.col(_RPREFIX + c))
            )

    keep = [F.col(c) for c in left.columns]
    keep += [F.col(_RPREFIX + c).alias(c) for c in value_cols]
    return out.select(*keep)


def bucketize_point(time_col: Column, bucket_us: int) -> Column:
    """Fixed-width time-bucket id of a point timestamp."""
    return F.floor(F.unix_micros(time_col) / F.lit(bucket_us)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_time: str,
    start: str,
    end: str,
    bucket_us: int,
) -> DataFrame:
    """Inner join of point rows to interval rows with the same ``on``
    keys and ``start <= point_time <= end`` (closed interval).

    ``bucket_us`` is the bucketing granularity; pick it near the
    typical interval length so each interval covers O(1) buckets.  The
    exploded interval side grows by ``len/bucket + 1`` rows — bounded
    fan-out, never a cross product; at 100 TB both sides shuffle on
    ``(keys, bucket)`` and AQE handles the rest.

    Columns from both inputs are kept (point columns first); the
    caller resolves any name collisions beforehand.
    """
    on = list(on)
    p = points.withColumn("__bucket", bucketize_point(F.col(point_time), bucket_us))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                bucketize_point(F.col(start), bucket_us),
                bucketize_point(F.col(end), bucket_us),
            )
        ),
    )
    joined = p.join(i, on + ["__bucket"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("__bucket")
