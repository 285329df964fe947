"""Physical-ID map: arbitrary string names ↔ dense vertex ids (M8).

The reference keeps a concurrent hash map from byte-strings to dense
vertex ids so vertices can be created by name at ingest
(``include/stinger.h:171-183``, ``src/core/stinger-physmap.c:35-110``,
used by the CSV stream ``src/stream/csv_stream.c:58-67``).

Spark-first design: the map is a **dimension table**
``(name STRING, vid LONG)`` with ids dense in ``0..n-1``, assigned by
global sort order so the assignment is deterministic and
oracle-checkable.  Id assignment uses ``zipWithIndex`` over the
sorted distinct names — the distributed dense-rank idiom: each
partition numbers locally and offsets by the (tiny, driver-collected)
partition sizes, so there is **no single-partition window sort**; the
only shuffle is the range-partition sort itself.  Lookups are plain
(broadcastable) joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

MAP_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("vid", LongType(), False),
    ]
)


def build_physmap(names: DataFrame, name_col: str = "name") -> DataFrame:
    """``(name, vid)`` with vids dense in ``0..n-1`` ordered by name.

    Deterministic analog of ``stinger_mapping_create``
    (``stinger-physmap.c:82-110``): same input set ⇒ same mapping,
    regardless of partitioning or arrival order.
    """
    distinct = names.select(F.col(name_col).cast("string").alias("name")).distinct()
    spark = distinct.sparkSession
    indexed = (
        distinct.repartitionByRange(distinct.rdd.getNumPartitions() or 1, "name")
        .sortWithinPartitions("name")
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
    )
    return spark.createDataFrame(indexed, MAP_SCHEMA)


def extend_physmap(mapping: DataFrame, new_names: DataFrame, name_col: str = "name") -> DataFrame:
    """Add unseen names with fresh ids above the current max —
    the upsert half of ``stinger_mapping_create`` (existing name ⇒
    existing id)."""
    fresh = (
        new_names.select(F.col(name_col).cast("string").alias("name"))
        .distinct()
        .join(mapping.select("name"), "name", "left_anti")
    )
    base = mapping.agg(F.coalesce(F.max("vid") + 1, F.lit(0)).alias("b")).collect()[0]["b"]
    extra = build_physmap(fresh).select("name", (F.col("vid") + F.lit(base)).alias("vid"))
    return mapping.unionByName(extra)


def lookup(mapping: DataFrame, names: DataFrame, name_col: str = "name") -> DataFrame:
    """``stinger_mapping_lookup``: name → vid (inner join; unseen
    names drop out, mirroring the reference's -1 return)."""
    return names.join(
        F.broadcast(mapping).withColumnRenamed("name", name_col), name_col, "inner"
    )


def reverse_lookup(mapping: DataFrame, vids: DataFrame, vid_col: str = "vid") -> DataFrame:
    """``stinger_mapping_physid_get``: vid → name."""
    return vids.join(
        F.broadcast(mapping).withColumnRenamed("vid", vid_col), vid_col, "inner"
    )
