"""Distributed ordered prefix sum (exclusive scan).

The reference builds CSR offset arrays with a serial exclusive scan
over vertex id (``rmatter/src/rmatter.c:23-69``,
``stinger_to_sorted_csr`` ``tests/stinger/src/util/stinger-utils.c:
439-499``).  A naive Spark translation is
``SUM() OVER (ORDER BY id)`` — a window with no PARTITION BY, which
Spark executes as a **single-task global sort**: fine at 21k vertices,
a bottleneck at 16M+ and a non-starter at 100 TB.

The scale shape is the classic two-level scan:

1. range-repartition by the order column (parallel range shuffle);
2. per-partition local exclusive scan (each task scans only its
   slice);
3. cumulate the per-partition totals — a table with one row per
   partition (thousands at most), so its global window is trivially
   cheap — and broadcast the partition bases back.

Total cost: one range shuffle + one tiny broadcast; every stage is
parallel in the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "off",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``order_col`` order (the CSR offset shape: first row 0, each next
    row the running total of everything strictly before it).

    ``order_col`` may be a single column name or a list of sort
    expressions (e.g. ``[F.desc("rev"), F.col("key")]``) forming a
    total order; values of the full order key must be unique.  Output
    partitioning follows the per-partition scan.
    """
    order_exprs = order_col if isinstance(order_col, (list, tuple)) else [order_col]
    ranged, _ = _ranged_with_pid(df, order_exprs, num_partitions)
    # 2. local exclusive scan within each range slice
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0)).cast("long")
    )
    # 3. partition bases: one row per partition — the only global
    # window runs over ≤ num_partitions rows
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .withColumn("_base", F.coalesce(F.sum("_tot").over(w_base), F.lit(0)).cast("long"))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn(out_col, (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )


def _ranged_with_pid(df: DataFrame, order_exprs, num_partitions: int | None):
    """Range-shuffle ``df`` on the order expressions and tag each row
    with its physical partition id.  ``repartitionByRange`` assigns
    ascending partition ids to ascending sort-key ranges (for ``desc``
    expressions, to descending value ranges) — so ``_pid`` order IS
    global order, the invariant every helper below builds on.

    The result is LAZILY localCheckpoint-ed: every helper consumes it
    in TWO branches (local ranks + per-partition bases), and joining
    them on ``_pid`` is only sound if both branches see the SAME
    sampled range boundaries.  The checkpoint pins one materialization
    (both subtrees read the one checkpointed RDD, whose range
    boundaries are fixed at first computation) without relying on
    exchange-reuse deduplicating two identical shuffles — which
    ``spark.sql.exchange.reuse=false`` would silently break.
    ``eager=False`` keeps it job-free until the consumer runs, and —
    unlike a bare ``persist()``, which pins a CacheManager entry until
    an explicit unpersist — checkpointed RDD blocks are freed by the
    ContextCleaner once the Dataset is garbage-collected, so repeated
    helper calls in a long session do not accumulate storage."""
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return (
        df.repartitionByRange(n, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False),
        n,
    )


def range_row_number(
    df: DataFrame,
    order_exprs,
    out_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` in ``order_exprs`` order without a
    single-task global sort (the scale-safe replacement for
    ``row_number().over(Window.orderBy(...))`` with no partitionBy).

    ``order_exprs`` must define a TOTAL order (append a unique
    tiebreaker column) so the result is deterministic and ties never
    straddle a range boundary ambiguously.

    Shape: one range shuffle, per-partition local row_number (parallel),
    plus a per-partition-count table of ≤ ``num_partitions`` rows whose
    global window is trivially cheap, broadcast back as rank bases.
    """
    local, bases = _local_ranks_and_bases(df, order_exprs, num_partitions)
    return (
        local.join(F.broadcast(bases.select("_pid", "_base")), "_pid")
        .withColumn(out_col, (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )


def _local_ranks_and_bases(df, order_exprs, num_partitions):
    """Shared core of row_number/ntile: (per-row local ranks tagged
    with ``_pid``, per-partition ``(_pid, _tot, _base)`` table)."""
    ranged, _ = _ranged_with_pid(df, order_exprs, num_partitions)
    w_local = Window.partitionBy("_pid").orderBy(*order_exprs)
    local = ranged.withColumn("_local", F.row_number().over(w_local))
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_tot"))
        .withColumn(
            "_base",
            F.coalesce(F.sum("_tot").over(w_base), F.lit(0)).cast("long"),
        )
    )
    return local, bases


def range_ntile(
    df: DataFrame,
    order_exprs,
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``ntile(k)`` in ``order_exprs`` order, scale-safe.

    Standard-SQL ntile semantics (identical in Spark and DuckDB): with
    ``n`` rows, the first ``n mod k`` buckets hold ``⌈n/k⌉`` rows, the
    rest ``⌊n/k⌋`` — computed in closed form from the distributed
    global rank, so the single-task ``ntile().over(Window.orderBy())``
    sort never happens.  ``order_exprs`` must be a total order.
    """
    local, bases = _local_ranks_and_bases(df, order_exprs, num_partitions)
    ranked = (
        local.join(F.broadcast(bases.select("_pid", "_base")), "_pid")
        .withColumn("_gr", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )
    # total row count from the (≤ num_partitions-row) bases table — no
    # second scan of the input lineage
    n_tot = bases.agg(F.sum("_tot").cast("long").alias("_n"))
    bucket = ntile_expr(F.col("_gr"), F.col("_n"), k)
    return (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn(out_col, bucket)
        .drop("_gr", "_n")
    )


def _idiv(a, b):
    """Exact long floor-div for non-negative operands: strip the
    remainder first, so the double division is of exactly-divisible
    ≤2^53 ints (bit-exact at any realistic row count)."""
    return ((a - (a % b)) / b).cast("long")


def ntile_expr(rank_col, n_col, k: int):
    """Standard-SQL ``ntile(k)`` as a closed-form Column over a
    (1-based total-order rank, total row count) pair — identical to
    Spark's and DuckDB's window ntile: the first ``n mod k`` buckets
    hold ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋``."""
    q = _idiv(n_col, F.lit(k))
    rem = n_col % k
    big_span = (q + 1) * rem
    return (
        F.when(rank_col <= big_span, _idiv(rank_col - 1, q + 1) + 1)
        .otherwise(
            rem + _idiv(rank_col - big_span - 1, F.greatest(q, F.lit(1))) + 1
        )
        .cast("int")
    )


def range_lag(
    df: DataFrame,
    order_exprs,
    value_col: str,
    out_col: str = "prev",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``lag(value_col, 1)`` in ``order_exprs`` order, scale-safe.

    Per-partition local lag fills every row except each range slice's
    first; those are patched from a one-row-per-partition "last value"
    table shifted by one partition (≤ ``num_partitions`` rows — its
    global window is trivially cheap) and broadcast back.  The global
    first row stays NULL, matching ``lag``.  ``order_exprs`` must be a
    total order.
    """
    ranged, _ = _ranged_with_pid(df, order_exprs, num_partitions)
    w_local = Window.partitionBy("_pid").orderBy(*order_exprs)
    local = ranged.withColumn("_lag", F.lag(value_col).over(w_local)).withColumn(
        "_rn", F.row_number().over(w_local)
    )
    w_all = w_local.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lasts = (
        ranged.withColumn("_last", F.last(value_col).over(w_all))
        .select("_pid", "_last")
        .distinct()
    )
    w_pid = Window.orderBy("_pid")
    prev_last = lasts.withColumn("_plast", F.lag("_last").over(w_pid)).select(
        "_pid", "_plast"
    )
    return (
        local.join(F.broadcast(prev_last), "_pid", "left")
        .withColumn(
            out_col,
            F.when(F.col("_rn") == 1, F.col("_plast")).otherwise(F.col("_lag")),
        )
        .drop("_pid", "_lag", "_rn", "_plast")
    )
