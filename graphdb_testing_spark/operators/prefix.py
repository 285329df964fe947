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

    ``order_col`` values must be unique (vertex ids are).  Output
    partitioning follows the per-partition scan.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(n, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # 2. local exclusive scan within each range slice
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
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
