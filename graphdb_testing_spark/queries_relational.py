"""Relational coverage: prefix sums, semi/anti joins, distinct counts.

Rounds out the SURVEY.md §2.6/§2.7 aggregation and join inventory on
the relational tables: running totals (the window-function analog of
the reference's ``prefix_sum``, ``rmatter/src/rmatter.c:23-69``),
existence/absence joins (``has_typed_successor`` semi-join and
deletion anti-join shapes, ``include/stinger.h:214-216``), and
COUNT(DISTINCT) group-bys (``tests/sqlite/test.c:180``).

Registered into the shared registry on import, like
:mod:`queries_pipeline`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import datasets
from .queries import register

# ---------------------------------------------------------------------------
# prefix sum: daily revenue + running cumulative total
# ---------------------------------------------------------------------------


@register(
    "daily_revenue_running",
    """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_epoch,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT day_epoch,
       CAST(rev AS DOUBLE) AS day_revenue,
       CAST(SUM(rev) OVER (ORDER BY day_epoch) AS DOUBLE) AS cum_revenue
FROM daily
""",
)
def q_daily_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a running cumulative total — the
    window-function form of the reference's parallel ``prefix_sum``
    (``rmatter.c:23-69``).  The unpartitioned ordered window runs over
    the *daily aggregate* (one row per date — a few thousand rows at
    any scale), never the raw fact table, so the single-partition
    window stage stays trivially small.  Sums stay DECIMAL through
    both the group-by and the window (exact, order-independent) and
    cast to DOUBLE only on output."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("long").alias("day_epoch")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("day_epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day_epoch",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# anti-join: customers with no orders, per nation
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    """
SELECT n.n_name AS nation, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY n.n_name
""",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count of customers with no order since 1998 — the
    absence/anti-join shape (same plan as the deletion anti-join,
    ``operators/updates.py`` M3).  The date filter is pushed to the
    orders scan before the anti-join, which shuffles on ``custkey``;
    the nation dim is broadcast.  (Lapsed-since-1998 rather than
    never-ordered: every synthetic customer has some order, so the
    unfiltered variant is vacuously empty.)"""
    cust = datasets.load_table(spark, sf_dir, "customer")
    orders = (
        datasets.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    nat = datasets.load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# semi-join: orders with at least one returned lineitem, per priority
# ---------------------------------------------------------------------------


@register(
    "returned_orders_by_priority",
    """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q_returned_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having ≥1 returned lineitem, counted per priority — the
    existence/semi-join shape (``has_typed_successor``,
    ``include/stinger.h:214-216``; TPC-H Q4's EXISTS).  The return
    filter is pushed to the lineitem scan before the semi-join."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    returned = (
        datasets.load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) group-by: unique users per event type
# ---------------------------------------------------------------------------


@register(
    "distinct_users_by_type",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (COUNT(DISTINCT) group-by,
    ``tests/sqlite/test.c:180``).  Catalyst expands this to the
    two-level partial-distinct aggregate; at 100 TB the same query
    swaps to ``approx_count_distinct`` (HLL) when ±2% is acceptable."""
    ev = datasets.load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# exact quantiles: median / p90 of event value per type
# ---------------------------------------------------------------------------


@register(
    "event_value_quantiles",
    """
SELECT event_type,
       ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
       ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def q_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median and p90 of event value per type
    (``percentile`` — Catalyst's exact sort-based aggregate; DuckDB's
    ``quantile_cont`` uses the same linear interpolation).  At 100 TB
    the same query swaps to ``approx_percentile`` (t-digest sketch,
    mergeable map-side) when sketch accuracy suffices."""
    ev = datasets.load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).alias("p90"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# event debounce: drop same-(user, type) events within 60s of the
# previous occurrence — the stream-dedup / rate-limit shape
# ---------------------------------------------------------------------------


@register(
    "event_debounce",
    """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM (
  SELECT event_id, user_id, event_type, ts,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
) WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 60000000
""",
)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: keep an event only if the previous event of the same
    (user, type) is more than 60s older — lag over an ordered
    per-key window, the batch twin of a streaming rate limiter.
    Partitioned by (user, type): state is one timestamp per key, the
    same keyspace a `applyInPandasWithState` port would shard on."""
    ev = datasets.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("prev_us", prev_us)
        .filter(
            F.col("prev_us").isNull()
            | (F.unix_micros("ts") - F.col("prev_us") > 60_000_000)
        )
        .select(
            "event_id", "user_id", "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# cohort retention: users bucketed by first-seen week × active week
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    """
WITH firstw AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT epoch_us(f.cohort_week) AS cohort_week_us,
       epoch_us(a.active_week) AS active_week_us,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM firstw f JOIN active a USING (user_id)
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: distinct users per (first-seen week,
    active week) — two map-side-combined aggregates and one join on
    user_id; the classic product-analytics rollup."""
    ev = datasets.load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firstw = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = ev.select("user_id", wk.alias("active_week")).distinct()
    return (
        firstw.join(active, "user_id")
        .groupBy(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            F.unix_micros("active_week").alias("active_week_us"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# semi-structured extraction: JSON props column
# ---------------------------------------------------------------------------


@register(
    "json_props_stats",
    """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
GROUP BY event_type
""",
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract ``$.k`` from the JSON props
    column (JVM-side ``get_json_object`` — no Python) and aggregate
    per event type.  At scale the extraction happens in the scan
    projection; only (event_type, k) longs reach the shuffle."""
    ev = datasets.load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# ordered conversion funnel: view -> click -> purchase per user
# ---------------------------------------------------------------------------


@register(
    "conversion_funnel",
    """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS step_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
FROM firsts
""",
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel counts: users with a view, whose first click
    follows their first view, whose first purchase follows that click
    — one conditional-min aggregate per user then one global rollup
    (two map-side-combined aggregations, no joins, no window)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
    )
    saw_view = F.col("t_view").isNotNull()
    clicked = saw_view & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(saw_view.cast("int")).cast("long").alias("step_view"),
        F.sum(clicked.cast("int")).cast("long").alias("step_click"),
        F.sum(purchased.cast("int")).cast("long").alias("step_purchase"),
    )


# ---------------------------------------------------------------------------
# heavy hitters: top-3 users per hour (windowed group limit)
# ---------------------------------------------------------------------------


@register(
    "hourly_heavy_hitters",
    """
WITH per AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour_us, user_id, n_events, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_us
                               ORDER BY n_events DESC, user_id) AS rnk
  FROM per
) WHERE rnk <= 3
""",
)
def q_hourly_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per hour — per-bucket count then a
    WindowGroupLimit top-k (rank pushed into the shuffle, no global
    sort), deterministic user_id tie-break.  The exact small-scale
    twin of a streaming count-min/heap heavy-hitter sketch."""
    ev = datasets.load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        "user_id",
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("hour_us").orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        per.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("hour_us", "user_id", "n_events", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# weekday seasonality (portable integer weekday arithmetic)
# ---------------------------------------------------------------------------


@register(
    "weekday_activity",
    """
SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
         AS total_value_micros
FROM events GROUP BY 1
""",
)
def q_weekday_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity by weekday (0=Sunday) — weekday derived as
    ``(epoch_days + 4) % 7`` pure integer arithmetic, sidestepping the
    engines' incompatible DAYOFWEEK conventions; value totals summed
    per-row to integer micros before summation (double sums are
    partition-order-dependent; integer sums are exact)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    wd = (F.floor(F.unix_micros("ts") / 86_400_000_000) + 4) % 7
    return ev.groupBy(wd.alias("weekday")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.round(F.col("value") * 1_000_000.0).cast("long"))
        .cast("long")
        .alias("total_value_micros"),
    )


# ---------------------------------------------------------------------------
# bounded moving window: 7-day trailing average of daily event counts
# ---------------------------------------------------------------------------


@register(
    "weekly_moving_average",
    """
WITH daily AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT day_us, n_events,
       CAST(SUM(n_events) OVER w AS BIGINT) AS window_events,
       CAST(COUNT(*) OVER w AS BIGINT) AS window_days,
       ROUND(SUM(n_events) OVER w / CAST(COUNT(*) OVER w AS DOUBLE), 6)
         AS moving_avg
FROM daily
WINDOW w AS (ORDER BY day_us ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def q_weekly_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing average of daily event volume — the bounded
    ROWS-frame window (distinct from the unbounded prefix sum in
    `daily_revenue_running`); integer sums, one final division."""
    from pyspark.sql import Window

    ev = datasets.load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.orderBy("day_us").rowsBetween(-6, 0)
    return daily.select(
        "day_us",
        "n_events",
        F.sum("n_events").over(w).cast("long").alias("window_events"),
        F.count("*").over(w).cast("long").alias("window_days"),
        F.round(
            F.sum("n_events").over(w) / F.count("*").over(w).cast("double"), 6
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# percentile ranks of order totals (percent_rank window surface)
# ---------------------------------------------------------------------------


@register(
    "order_percentiles",
    """
SELECT o_orderkey,
       ROUND(o_totalprice, 2) AS total,
       ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6)
         AS pct_rank,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS quartile
FROM orders
""",
)
def q_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + quartile of every order by total price
    (deterministic (price, key) order) — the remaining ranking-window
    surface next to row_number/rank/ntile-by-group.

    Scale shape: the global order statistic comes from
    :func:`operators.prefix.range_row_number` (range shuffle +
    parallel local ranks + broadcast per-partition bases), NOT an
    unpartitioned window; (price, key) is a total order so
    ``percent_rank = (rn−1)/(n−1)`` and ``ntile`` has the closed form
    in :func:`operators.prefix.ntile_expr`."""
    from .operators.prefix import ntile_expr, range_row_number

    orders = datasets.load_table(spark, sf_dir, "orders")
    ranked = range_row_number(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
        "_rn",
    )
    n_tot = orders.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_tot))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.round(
                (F.col("_rn") - 1)
                / F.greatest(F.col("_n") - 1, F.lit(1)).cast("double"),
                6,
            ).alias("pct_rank"),
            ntile_expr(F.col("_rn"), F.col("_n"), 4).cast("long").alias(
                "quartile"
            ),
        )
    )


# ---------------------------------------------------------------------------
# portable SQL-text interface: ONE string is both the Spark query
# (spark.sql over registered views) and the DuckDB oracle
# ---------------------------------------------------------------------------

_PORTABLE_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY 1, 2, 3
"""


@register("sql_text_interface", _PORTABLE_SQL)
def q_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string entrypoint: the registered oracle text itself is
    executed by ``spark.sql`` over a temp view — one ANSI-portable
    statement (EXTRACT / CAST / FLOOR / conditional aggregation,
    per-row cent quantization for order-independent sums) produces the
    identical result on both engines.  Demonstrates that the engine's
    declarative surface is not DataFrame-only."""
    datasets.load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PORTABLE_SQL)


# ---------------------------------------------------------------------------
# conversion lag quantiles (view -> purchase latency per user)
# ---------------------------------------------------------------------------


@register(
    "conversion_lag_quantiles",
    """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
),
lags AS (
  SELECT CAST(t_buy - t_view AS DOUBLE) AS lag_us
  FROM firsts WHERE t_view IS NOT NULL AND t_buy > t_view
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(lag_us, 0.5) / 1000000.0, 3) AS p50_lag_s,
       ROUND(quantile_cont(lag_us, 0.9) / 1000000.0, 3) AS p90_lag_s
FROM lags
""",
)
def q_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p90 latency from first view to first purchase across
    converting users — exact interpolated quantiles over integer-micro
    lags (the `event_value_quantiles` idiom on a derived funnel
    metric)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    lags = firsts.filter(
        F.col("t_view").isNotNull() & (F.col("t_buy") > F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).cast("double").alias("lag_us"))
    # micro-lags are ~1e11: ROUND(x, 6) at that magnitude is beyond
    # double precision and the two engines' interpolation differs in
    # the last ulp — report seconds at millisecond resolution instead
    return lags.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.expr("percentile(lag_us, 0.5)") / 1_000_000.0, 3).alias(
            "p50_lag_s"
        ),
        F.round(F.expr("percentile(lag_us, 0.9)") / 1_000_000.0, 3).alias(
            "p90_lag_s"
        ),
    )


# ---------------------------------------------------------------------------
# per-series anomaly detection: hourly z-scores with integer moments
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cnt) AS BIGINT) AS s, CAST(SUM(cnt * cnt) AS BIGINT) AS sq
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hour_epoch, h.cnt,
       CAST(FLOOR(1000.0 * (h.cnt * m.n - m.s) /
                  SQRT(CAST(m.n * m.sq - m.s * m.s AS DOUBLE))) AS BIGINT)
         AS z_milli
FROM hourly h JOIN moments m USING (event_type)
WHERE m.n * m.sq - m.s * m.s > 0
"""


@register("hourly_anomalies", _ANOMALY_ORACLE)
def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series anomaly score: z-score of each hour's event count
    against its event type's own distribution.  The moments are exact
    BIGINT sums (``n·Σc² − (Σc)²``), so the only floats are one
    multiply, one IEEE-correctly-rounded sqrt, and one divide —
    bit-deterministic across engines, hence hash-checkable; the same
    trick is what makes the two-pass variance shuffle-free (moments
    ride the same groupBy as the counts).  Variance-zero series are
    excluded on both sides."""
    ev = datasets.load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("long").alias("hour_epoch"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    moments = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sq"),
    )
    var_num = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .filter(var_num > 0)
        .select(
            "event_type",
            "hour_epoch",
            "cnt",
            F.floor(
                F.lit(1000.0)
                * (F.col("cnt") * F.col("n") - F.col("s"))
                / F.sqrt(var_num.cast("double"))
            )
            .cast("long")
            .alias("z_milli"),
        )
    )


# ---------------------------------------------------------------------------
# exponential recency decay, exact in integers (2^-age_days weights)
# ---------------------------------------------------------------------------

_RECENCY_ORACLE = """
WITH ref AS (SELECT MAX(epoch_us(ts)) AS r FROM events),
aged AS (
  SELECT user_id,
         (ref.r - epoch_us(ts)) // 86400000000 AS age_days
  FROM events CROSS JOIN ref
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN age_days <= 40
                     THEN (1::BIGINT << CAST(40 - age_days AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS recency_num
FROM aged GROUP BY user_id
"""


@register("recency_scores", _RECENCY_ORACLE)
def q_recency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially decayed activity score per user:
    ``Σ 2^-age_days``, kept EXACT by scaling to the integer
    ``Σ 2^(40-age)`` (the score is ``recency_num / 2^40``).  Decay
    aggregations are how feature stores summarize unbounded histories
    in one pass; the dyadic base makes the distributed sum
    order-independent and the oracle float-free.  One scalar
    reference (max ts) + one map-side-combining groupBy."""
    ev = datasets.load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("r"))
    aged = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        ((F.col("r") - F.unix_micros("ts")) / F.lit(86400000000)).cast("long").alias("age_days"),
    )
    return aged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(
            F.when(
                F.col("age_days") <= 40,
                F.expr("shiftleft(cast(1 as bigint), cast(40 - age_days as int))"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("recency_num"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7-shaped volume shipping between nation pairs
# ---------------------------------------------------------------------------

_VOLUME_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1e0 - l.l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE sn.n_nationkey <> cn.n_nationkey
  AND sn.n_nationkey < 5 AND cn.n_nationkey < 5
GROUP BY 1, 2, 3
"""


@register("volume_shipping", _VOLUME_ORACLE)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation revenue by (supplier nation,
    customer nation, ship year) for a nation subset.  The fact table
    joins two independent dimension chains — Catalyst broadcasts all
    four dims, so the only big shuffle is the final group-by; money
    stays DECIMAL until the end."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    od = datasets.load_table(spark, sf_dir, "orders")
    cu = datasets.load_table(spark, sf_dir, "customer")
    su = datasets.load_table(spark, sf_dir, "supplier")
    na = datasets.load_table(spark, sf_dir, "nation")
    cn = na.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("c_nk") < 5)
    sn = na.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("s_nk") < 5)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("c_nk"))
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("s_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-shaped promotion revenue share per month
# ---------------------------------------------------------------------------

_PROMO_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS m,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1e0 - l.l_discount)
                          AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
         AS promo_revenue,
       CAST(SUM(CAST(l.l_extendedprice * (1e0 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
"""


@register("promo_revenue_share", _PROMO_ORACLE)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue vs total per ship month.
    One broadcast of the part dim; conditional aggregation in the
    same pass as the total (no second scan); exact DECIMAL money."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    pa = datasets.load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("y"),
            F.month("l_shipdate").cast("long").alias("m"),
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# sweep-line peak concurrency of user sessions
# ---------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH marks AS (
  SELECT user_id, epoch_us(ts) AS t
  FROM events
),
sess AS (
  SELECT user_id, MIN(t) AS s_start, MAX(t) + 1 AS s_end
  FROM (
    SELECT user_id, t,
           SUM(CASE WHEN gap > 1800000000 OR gap IS NULL THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid
    FROM (SELECT user_id, t,
                 t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
          FROM marks)
  ) GROUP BY user_id, sid
),
deltas AS (
  SELECT s_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT s_end AS t, -1 FROM sess
),
sweep AS (
  SELECT t, SUM(delta) AS d FROM deltas GROUP BY t
),
run AS (
  SELECT t, SUM(d) OVER (ORDER BY t) AS live FROM sweep
)
SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
       CAST(MAX(live) AS BIGINT) AS peak_concurrent,
       CAST((SELECT t FROM run ORDER BY live DESC, t LIMIT 1) AS BIGINT)
         AS peak_at_us
FROM run
"""


@register("peak_concurrency", _CONCURRENCY_ORACLE)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrency over 30-minute-gap user
    sessions: ±1 deltas at session boundaries, running sum, global
    max — the interval-overlap primitive (capacity planning, load
    peaks).  Sessionization shuffles once on user; the sweep's
    global running sum is :func:`operators.prefix.range_prefix_sum`
    over the time axis (range shuffle + parallel per-partition scans +
    broadcast bases) — never a single-task ``Window.orderBy`` over the
    O(sessions) boundary table."""
    ev = datasets.load_table(spark, sf_dir, "events")
    marks = ev.select("user_id", F.unix_micros("ts").alias("t"))
    wu = Window.partitionBy("user_id").orderBy("t")
    gaps = marks.withColumn("gap", F.col("t") - F.lag("t").over(wu))
    sess = (
        gaps.withColumn(
            "sid",
            F.sum(
                F.when(
                    F.col("gap").isNull() | (F.col("gap") > 1_800_000_000), 1
                ).otherwise(0)
            ).over(wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("s_start"), (F.max("t") + 1).alias("s_end"))
        .localCheckpoint()
    )
    deltas = sess.select(F.col("s_start").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = deltas.groupBy("t").agg(F.sum("delta").alias("d"))
    from .operators.prefix import range_prefix_sum

    run = range_prefix_sum(sweep, "t", "d", "_excl").withColumn(
        "live", F.col("_excl") + F.col("d")
    )
    n_sessions = sess.count()
    peak = (
        run.orderBy(F.desc("live"), "t")
        .limit(1)
        .select(
            F.lit(n_sessions).cast("long").alias("n_sessions"),
            F.col("live").cast("long").alias("peak_concurrent"),
            F.col("t").cast("long").alias("peak_at_us"),
        )
    )
    return peak


# ---------------------------------------------------------------------------
# audience overlap: Jaccard of user sets between event types
# ---------------------------------------------------------------------------

_AUDIENCE_ORACLE = """
WITH aud AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM aud GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM aud a JOIN aud b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_common,
       sa.n AS n_a, sb.n AS n_b,
       CAST((1000 * i.n_common) // (sa.n + sb.n - i.n_common) AS BIGINT)
         AS jaccard_milli
FROM inter i
JOIN sz sa ON sa.event_type = i.type_a
JOIN sz sb ON sb.event_type = i.type_b
"""


@register("audience_overlap", _AUDIENCE_ORACLE)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience Jaccard between event types: distinct-user sets,
    user-keyed self-join for intersections, integer milli-Jaccard.
    The |types|² output is tiny at any scale; the shuffles stay on
    ``user_id`` — the segment-overlap primitive of audience
    analytics."""
    ev = datasets.load_table(spark, sf_dir, "events")
    aud = ev.select("event_type", "user_id").distinct().localCheckpoint()
    sz = aud.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = aud.alias("a")
    b = aud.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_common", "n_a", "n_b",
            F.expr("(1000 * n_common) div (n_a + n_b - n_common)")
            .cast("long")
            .alias("jaccard_milli"),
        )
    )


# ---------------------------------------------------------------------------
# cross-table state-machine consistency crosstab (data quality)
# ---------------------------------------------------------------------------

_CONSISTENCY_ORACLE = """
SELECT o.o_orderstatus, l.l_returnflag, l.l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
"""


@register("order_status_crosstab", _CONSISTENCY_ORACLE)
def q_order_status_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality crosstab over the order/lineitem state machine:
    every (order status, return flag, line status) combination with
    line and distinct-order counts — the contingency table a
    validation suite diffs against the allowed-transitions set.  One
    fact-keyed join (orders broadcasts), one aggregation."""
    od = datasets.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = datasets.load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(od), li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus", "l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# distributed OLS trend per series (exact sufficient statistics)
# ---------------------------------------------------------------------------

_TRENDS_ORACLE = """
WITH ref AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
pts AS (
  SELECT event_type,
         CAST((epoch_us(ts) - ref.t0) // 86400000000 AS BIGINT) AS x,
         CAST(value AS DECIMAL(18,6)) AS y
  FROM events CROSS JOIN ref
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(18,6)) * y) AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       ROUND((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
         AS slope_per_day,
       ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
              - sx * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) * sx) / n, 6)
         AS intercept
FROM stats
WHERE n * sxx - sx * sx > 0
"""


@register("value_trends", _TRENDS_ORACLE)
def q_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (slope/day + intercept) of event
    values, computed from EXACT sufficient statistics: integer day
    offsets (Σx, Σx² in BIGINT) and DECIMAL value sums (Σy, Σxy) — the
    sufficient-stats reduction is THE distributed regression pattern
    (one map-side-combining pass, no per-partition float drift), and
    makes the final double arithmetic bit-deterministic for the
    oracle.  Degenerate single-day series are excluded on both
    sides."""
    ev = datasets.load_table(spark, sf_dir, "events")
    ref = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    pts = ev.crossJoin(F.broadcast(ref)).select(
        "event_type",
        ((F.unix_micros("ts") - F.col("t0")) / F.lit(86400000000))
        .cast("long")
        .alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    stats = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,6)") * F.col("y")).alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx") * F.col("sy").cast("double")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return (
        stats.filter(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
        )
        .select(
            "event_type",
            "n",
            F.round(slope, 6).alias("slope_per_day"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"), 6
            ).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# native session_window aggregation (the built-in sessionization path)
# ---------------------------------------------------------------------------

_SESSWIN_ORACLE = """
WITH marks AS (
  SELECT user_id, epoch_us(ts) AS t, value FROM events
),
islands AS (
  SELECT user_id, t, value,
         SUM(CASE WHEN gap > 1800000000 OR gap IS NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM (SELECT user_id, t, value,
               t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
        FROM marks)
)
SELECT user_id, MIN(t) AS session_start_us,
       MAX(t) + 1800000000 AS window_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM islands GROUP BY user_id, sid
"""


@register("session_window_rollup", _SESSWIN_ORACLE)
def q_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window(ts, gap)`` aggregation (the
    built-in sessionization operator, batch twin of the streaming
    session state store) — checked against the gaps-and-islands
    formulation: same sessions, same aggregates; ``window.end`` is
    last-event + gap by definition.  One user-keyed shuffle; the
    native operator merges windows inside the aggregation, no window
    function pass."""
    ev = datasets.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# PIVOT: per-user event-type count matrix
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'login') AS BIGINT) AS login,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY user_id
"""


@register("event_type_pivot", _PIVOT_ORACLE)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user feature matrix via the native ``pivot`` — the
    long→wide reshape every feature store does; with the pivot values
    listed explicitly Spark skips the distinct-scan and compiles to
    the same conditional aggregation as the FILTER oracle."""
    ev = datasets.load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "login", "purchase", "view"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("click", "error", "login", "purchase", "view")],
    )


# ---------------------------------------------------------------------------
# cumulative unique users per day (first-seen growth curve)
# ---------------------------------------------------------------------------

_CUMUNIQ_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS d FROM events GROUP BY user_id
),
daily AS (
  SELECT CAST(epoch(d) AS BIGINT) AS day_epoch,
         CAST(COUNT(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY d
)
SELECT day_epoch, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day_epoch) AS BIGINT)
         AS cumulative_users
FROM daily
"""


@register("cumulative_unique_users", _CUMUNIQ_ORACLE)
def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth curve: first-seen day per user, daily new-user counts,
    running total — the exact cumulative-distinct pattern (a naive
    windowed COUNT(DISTINCT) is quadratic state; first-seen + prefix
    sum is one aggregation + one tiny ordered scan over days)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d")
    )
    daily = firsts.groupBy(F.col("d").cast("long").alias("day_epoch")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    return daily.withColumn(
        "cumulative_users",
        F.sum("new_users").over(Window.orderBy("day_epoch")).cast("long"),
    )


# ---------------------------------------------------------------------------
# robust outlier detection: median absolute deviation (exact order stats)
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS med FROM ranked
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
),
dev AS (
  SELECT r.event_type, ABS(r.value - m.med) AS d, m.med
  FROM ranked r JOIN med m USING (event_type)
),
dranked AS (
  SELECT event_type, d, med,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, med, d AS mad FROM dranked
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
)
SELECT e.event_type,
       ROUND(m.med, 6) AS median_r6,
       ROUND(m.mad, 6) AS mad_r6,
       CAST(COUNT(*) FILTER (ABS(e.value - m.med) > 3 * m.mad) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type, m.med, m.mad
"""


@register("mad_outliers", _MAD_ORACLE)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per series: median and MAD as EXACT order
    statistics (row ``ceil(n/2)`` of the sorted values — no
    interpolation, so both engines pick the same element), outlier =
    ``|x − med| > 3·MAD``.  Two per-key sorts + one counting pass;
    at 100 TB swap the exact medians for the histogram sketch above
    (same downstream logic)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")
    ).select("event_type", F.col("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    dranked = dev.select(
        "event_type",
        "med",
        "d",
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    mad = dranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")
    ).select("event_type", "med", F.col("d").alias("mad"))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("median_r6"),
            F.round("mad", 6).alias("mad_r6"),
            "n_outliers",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# sliding (hopping) window counts: 1-hour windows every 15 minutes
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH ev AS (SELECT event_type, epoch_us(ts) AS t FROM events),
hits AS (
  SELECT e.event_type,
         ((e.t - k.k * 900000000) // 3600000000) * 3600000000
           + k.k * 900000000 AS ws
  FROM ev e, UNNEST(generate_series(0, 3)) AS k(k)
  WHERE ((e.t - k.k * 900000000) // 3600000000) * 3600000000
          + k.k * 900000000 <= e.t
)
SELECT event_type, CAST(ws // 1000000 AS BIGINT) AS window_start_epoch,
       CAST(COUNT(*) AS BIGINT) AS n
FROM hits GROUP BY 1, 2
"""


@register("sliding_window_counts", _SLIDING_ORACLE)
def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup: 1-hour windows sliding every 15 minutes
    via Spark's native ``window(ts, '1 hour', '15 minutes')`` — each
    event lands in 4 windows; the oracle derives the same 4 aligned
    window starts arithmetically (epoch-aligned, like Spark's).  The
    overlap factor is the cost model: a slide of 1/k multiplies the
    aggregation input k×, which is why watermarked incremental
    aggregation (the streaming twin of this exact operator) matters
    at scale."""
    ev = datasets.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "1 hour", "15 minutes").alias("w"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "event_type",
            (F.unix_micros("w.start") / 1_000_000).cast("long").alias(
                "window_start_epoch"
            ),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# greedy set cover: suppliers covering the most uncovered parts
# ---------------------------------------------------------------------------


def _setcover_oracle(rounds: int = 5) -> str:
    ctes = [
        "cov AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem)",
        "un0 AS (SELECT DISTINCT p FROM cov)",
        "pick0 AS (SELECT CAST(NULL AS BIGINT) AS s WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        pr = r - 1
        ctes.append(
            f"""pick{r} AS MATERIALIZED (
  SELECT s, CAST(n AS BIGINT) AS gain, {r} AS round FROM (
    SELECT c.s, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c.s) AS rn
    FROM cov c SEMI JOIN un{pr} u ON c.p = u.p
    GROUP BY c.s)
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""un{r} AS MATERIALIZED (
  SELECT u.p FROM un{pr} u
  WHERE NOT EXISTS (SELECT 1 FROM cov c JOIN pick{r} k ON c.s = k.s
                    WHERE c.p = u.p))"""
        )
    picks = " UNION ALL ".join(
        f"SELECT s, gain, CAST(round AS BIGINT) AS round FROM pick{r}"
        for r in range(1, rounds + 1)
    )
    return f"WITH {','.join(ctes)}\n{picks}"


@register("greedy_set_cover", _setcover_oracle(5))
def q_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy set cover, 5 rounds: repeatedly pick the supplier
    covering the most still-uncovered parts (ties to the smallest
    key) — the (1−1/e) approximation that underlies source selection
    / coverage-maximization in data acquisition.  Per round: one
    semi-join + count aggregation + one anti-coverage filter; the
    uncovered set shrinks monotonically."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    cov = (
        li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    un = cov.select("p").distinct().localCheckpoint()
    picks = []
    # one scalar top-1 collect per round (TakeOrderedAndProject, a
    # 1-row driver fetch, not a data collect); the ROUND COUNT is the
    # scale knob — cost is rounds × one distributed aggregate
    for r in range(1, 6):
        gains = (
            cov.join(un, "p", "semi")
            .groupBy("s")
            .agg(F.count("*").cast("long").alias("gain"))
        )
        top = gains.orderBy(F.desc("gain"), "s").limit(1).collect()
        if not top:  # everything covered — the oracle's picks go empty too
            break
        best = top[0]
        picks.append((int(best.s), int(best.gain), r))
        covered = cov.filter(F.col("s") == int(best.s)).select("p")
        un = un.join(covered, "p", "left_anti").localCheckpoint()
    return spark.createDataFrame(picks, "s long, gain long, round long")


# ---------------------------------------------------------------------------
# week-over-week revenue change
# ---------------------------------------------------------------------------

_WOW_ORACLE = """
WITH weekly AS (
  SELECT CAST(epoch(date_trunc('week', o_orderdate)) AS BIGINT) AS week_epoch,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT week_epoch, revenue,
       LAG(revenue) OVER (ORDER BY week_epoch) AS prev_revenue,
       CAST(CASE WHEN LAG(revenue) OVER (ORDER BY week_epoch) > 0
            THEN FLOOR(1000.0 * (revenue - LAG(revenue) OVER (ORDER BY week_epoch))
                       / LAG(revenue) OVER (ORDER BY week_epoch))
            ELSE NULL END AS BIGINT) AS wow_change_milli
FROM weekly
"""


@register("wow_revenue_change", _WOW_ORACLE)
def q_wow_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue deltas: DECIMAL weekly sums, one
    ordered LAG over the (tiny) week series, integer milli change —
    the growth-report staple.  The global window runs over one row
    per week, not per order."""
    od = datasets.load_table(spark, sf_dir, "orders")
    weekly = od.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("long").alias("week_epoch")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("week_epoch")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week_epoch",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev > 0, F.floor(F.lit(1000.0) * (F.col("revenue") - prev) / prev))
        .otherwise(F.lit(None))
        .cast("long")
        .alias("wow_change_milli"),
    )


# ---------------------------------------------------------------------------
# prequential anomaly scores: z against PRIOR hours only (streamable)
# ---------------------------------------------------------------------------

_PREQ_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, hour_epoch, cnt,
         COUNT(*) OVER w AS n,
         SUM(cnt) OVER w AS s,
         SUM(cnt * cnt) OVER w AS sq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_epoch, cnt,
       CAST(n AS BIGINT) AS n_prior,
       CAST(FLOOR(1000.0 * (cnt * n - s) /
                  SQRT(CAST(n * sq - s * s AS DOUBLE))) AS BIGINT) AS z_milli
FROM cum
WHERE n >= 2 AND n * sq - s * s > 0
"""


@register("prequential_anomalies", _PREQ_ORACLE)
def q_prequential_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (prequential) anomaly scores: each hour's count is
    z-scored against the moments of STRICTLY PRIOR hours only — the
    causally-valid scoring a live detector can actually compute
    (`hourly_anomalies` is its full-series retrospective twin).  Same
    exact-integer-moment trick, cumulative via one ordered window per
    series; a streaming detector carries (n, Σc, Σc²) as state and
    emits the identical score (parity test in test_streaming.py)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("long").alias("hour_epoch"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hourly.select(
        "event_type",
        "hour_epoch",
        "cnt",
        F.count("*").over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("sq"),
    )
    var_num = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    return (
        cum.filter((F.col("n") >= 2) & (var_num > 0))
        .select(
            "event_type",
            "hour_epoch",
            "cnt",
            F.col("n").cast("long").alias("n_prior"),
            F.floor(
                F.lit(1000.0)
                * (F.col("cnt") * F.col("n") - F.col("s"))
                / F.sqrt(var_num.cast("double"))
            )
            .cast("long")
            .alias("z_milli"),
        )
    )


# ---------------------------------------------------------------------------
# activity churn: biggest first-half -> second-half drops
# ---------------------------------------------------------------------------

_CHURN_ORACLE = """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
halves AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) * 2 < b.lo + b.hi THEN 1 ELSE 0 END)
              AS BIGINT) AS first_half,
         CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= b.lo + b.hi THEN 1 ELSE 0 END)
              AS BIGINT) AS second_half
  FROM events CROSS JOIN bounds b
  GROUP BY user_id
)
SELECT user_id, first_half, second_half,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT user_id, first_half, second_half,
         ROW_NUMBER() OVER (ORDER BY first_half - second_half DESC, user_id)
           AS rnk
  FROM halves WHERE first_half > 0)
WHERE rnk <= 20
"""


@register("activity_churn", _CHURN_ORACLE)
def q_activity_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn shortlist: the 20 users whose event volume dropped most
    between the observation window's first and second half (midpoint
    split on the integer µs axis, so the split is exact) — the
    engagement-decline report; one scalar bound + one conditional
    aggregation + top-k."""
    ev = datasets.load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    halves = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.unix_micros("ts") * 2 < F.col("lo") + F.col("hi")).cast("long")
            ).alias("first_half"),
            F.sum(
                (F.unix_micros("ts") * 2 >= F.col("lo") + F.col("hi")).cast("long")
            ).alias("second_half"),
        )
    )
    # top-k via orderBy().limit → TakeOrderedAndProject over the
    # O(users) table; the rank window then covers 20 rows only
    top = (
        halves.filter(F.col("first_half") > 0)
        .orderBy(F.desc(F.col("first_half") - F.col("second_half")), "user_id")
        .limit(20)
    )
    w = Window.orderBy(
        F.desc(F.col("first_half") - F.col("second_half")), "user_id"
    )
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "user_id",
        F.col("first_half").cast("long"),
        F.col("second_half").cast("long"),
        F.col("rnk").cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# range-partitioner split points (exact order-statistic boundaries)
# ---------------------------------------------------------------------------

_NSPLITS = 16

_SPLITS_ORACLE = f"""
WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
ranked AS (
  SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS rn,
         COUNT(*) OVER () AS n
  FROM keys
)
SELECT CAST(b.b AS BIGINT) AS bucket, r.k AS split_key,
       CAST(r.rn AS BIGINT) AS at_rank
FROM (SELECT UNNEST(generate_series(1, {_NSPLITS - 1})) AS b) b
JOIN ranked r ON r.rn = (r.n * b.b) // {_NSPLITS}
"""


@register("range_split_points", _SPLITS_ORACLE)
def q_range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced range-partitioner boundaries: the 15 exact order
    statistics at ranks ``⌊n·k/16⌋`` over the distinct key domain —
    what a range shuffle / Z-order writer computes before laying out
    files (Spark's own RangePartitioner samples; exact quantiles are
    the ground truth it approximates)."""
    ev = datasets.load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").alias("k")).distinct()
    # exact order statistics via the distributed two-level rank
    # (range shuffle + local ranks + broadcast bases) — never a
    # single-task Window.orderBy over the O(keys) table
    from .operators.prefix import range_row_number

    n_tot = keys.groupBy().agg(F.count(F.lit(1)).alias("n"))
    ranked = range_row_number(keys, [F.col("k")], "rn").crossJoin(
        F.broadcast(n_tot)
    )
    buckets = F.explode(
        F.array(*[F.lit(b) for b in range(1, _NSPLITS)])
    ).alias("bucket")
    targets = ranked.select("k", "rn", "n", buckets).filter(
        F.col("rn") == F.expr(f"(n * bucket) div {_NSPLITS}")
    )
    return targets.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("k").alias("split_key"),
        F.col("rn").cast("long").alias("at_rank"),
    )


# ---------------------------------------------------------------------------
# consistent-hash ring placement (4 nodes x 8 virtual nodes)
# ---------------------------------------------------------------------------

_RING_NODES = 4
_RING_VNODES = 8

_RING_ORACLE = f"""
WITH vnodes AS (
  SELECT n.n AS node, v.v AS vnode,
         ('0x' || substr(md5('ring|' || n.n::VARCHAR || '|' || v.v::VARCHAR),
          1, 8))::BIGINT AS token
  FROM (SELECT UNNEST(generate_series(0, {_RING_NODES - 1})) AS n) n,
       (SELECT UNNEST(generate_series(0, {_RING_VNODES - 1})) AS v) v
),
users AS (
  SELECT DISTINCT user_id,
         ('0x' || substr(md5('key|' || user_id::VARCHAR), 1, 8))::BIGINT
           AS utoken
  FROM events
),
assigned AS (
  SELECT u.user_id,
         COALESCE(
           (SELECT vn.node FROM vnodes vn WHERE vn.token >= u.utoken
            ORDER BY vn.token, vn.node LIMIT 1),
           (SELECT vn.node FROM vnodes vn ORDER BY vn.token, vn.node LIMIT 1)
         ) AS node
  FROM users u
)
SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS n_users
FROM assigned GROUP BY node
"""


@register("hash_ring_assignment", _RING_ORACLE)
def q_hash_ring_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring placement (Karger et al.; the
    Dynamo/Cassandra sharding primitive): 4 nodes × 8 virtual-node
    tokens on a 32-bit ring, each key owned by the first token
    clockwise — virtual nodes are what keep the load spread tight and
    make node addition move only 1/n of keys.  The 32-row token table
    broadcasts; assignment is one sort-free min-over-qualifying
    aggregation per key."""
    ev = datasets.load_table(spark, sf_dir, "events")
    from .hashutil import hash_prefix

    spark_tokens = [
        (n, v)
        for n in range(_RING_NODES)
        for v in range(_RING_VNODES)
    ]
    vn = spark.createDataFrame(spark_tokens, "node long, vnode long").select(
        "node",
        "vnode",
        hash_prefix(
            F.concat_ws("|", F.lit("ring"), F.col("node").cast("string"),
                        F.col("vnode").cast("string")),
            8,
        ).alias("token"),
    ).localCheckpoint()
    wrap = vn.orderBy("token", "node").limit(1).collect()[0]
    users = ev.select("user_id").distinct().select(
        "user_id",
        hash_prefix(
            F.concat_ws("|", F.lit("key"), F.col("user_id").cast("string")), 8
        ).alias("utoken"),
    )
    assigned = (
        users.join(F.broadcast(vn), F.col("token") >= F.col("utoken"), "left")
        .groupBy("user_id", "utoken")
        .agg(
            F.min(F.struct("token", "node")).alias("best")
        )
        .select(
            "user_id",
            F.coalesce(F.col("best.node"), F.lit(int(wrap.node))).alias("node"),
        )
    )
    return assigned.groupBy(F.col("node").cast("long").alias("node")).agg(
        F.count("*").cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# join-key skew report (hot-key shares per fact relation)
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH ks AS (
  SELECT 'events.user_id' AS relation_key, user_id AS k FROM events
  UNION ALL
  SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
),
cnt AS (
  SELECT relation_key, k, CAST(COUNT(*) AS BIGINT) AS c
  FROM ks GROUP BY 1, 2
)
SELECT relation_key,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS hottest,
       CAST((1000000 * MAX(c)) // SUM(c) AS BIGINT) AS top_share_micro
FROM cnt GROUP BY relation_key
"""


@register("skew_report", _SKEW_ORACLE)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: per fact-side key, the hottest key's row
    count and micro-share — the number that decides between a plain
    shuffle join, AQE skew splitting, and explicit salting
    (`operators/skew.py`).  One union of key projections, one
    two-level aggregation."""
    ev = datasets.load_table(spark, sf_dir, "events")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    ks = (
        ev.select(F.lit("events.user_id").alias("relation_key"), F.col("user_id").alias("k"))
        .unionAll(li.select(F.lit("lineitem.l_partkey"), F.col("l_partkey")))
        .unionAll(li.select(F.lit("lineitem.l_suppkey"), F.col("l_suppkey")))
    )
    cnt = ks.groupBy("relation_key", "k").agg(F.count("*").cast("long").alias("c"))
    return cnt.groupBy("relation_key").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("hottest"),
        F.expr("(1000000 * max(c)) div sum(c)").cast("long").alias("top_share_micro"),
    )


# ---------------------------------------------------------------------------
# behavioral diversity: per-user event-type entropy (micro-quantized)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cnts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS total FROM cnts GROUP BY user_id),
terms AS (
  SELECT c.user_id,
         CAST(FLOOR(1e6 * (LN(CAST(t.total AS DOUBLE)) - LN(CAST(c.c AS DOUBLE)))
                    * c.c / t.total) AS BIGINT) AS e_micro
  FROM cnts c JOIN tot t USING (user_id)
)
SELECT t.user_id, t.total AS n_events,
       CAST(SUM(e.e_micro) AS BIGINT) AS entropy_micro
FROM tot t JOIN terms e USING (user_id)
GROUP BY t.user_id, t.total
"""


@register("user_type_entropy", _ENTROPY_ORACLE)
def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity feature (bots are low-entropy, explorers high).  Each
    term ``p·ln(1/p)`` is quantized to integer micros BEFORE the sum
    (the TF-IDF/Zipf idiom), so the per-user total is an exact BIGINT
    and partition order cannot move it."""
    ev = datasets.load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = cnts.groupBy("user_id").agg(F.sum("c").cast("long").alias("total"))
    terms = cnts.join(tot, "user_id").select(
        "user_id",
        F.floor(
            F.lit(1e6)
            * (F.log(F.col("total").cast("double")) - F.log(F.col("c").cast("double")))
            * F.col("c")
            / F.col("total")
        )
        .cast("long")
        .alias("e_micro"),
    )
    return (
        tot.join(terms, "user_id")
        .groupBy("user_id", F.col("total").alias("n_events"))
        .agg(F.sum("e_micro").cast("long").alias("entropy_micro"))
        .select("user_id", "n_events", "entropy_micro")
    )


# ---------------------------------------------------------------------------
# revenue concentration: customer Gini coefficient
# ---------------------------------------------------------------------------

_REV_GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM rev
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS total_revenue,
       ROUND(2e0 * CAST(SUM(rnk * r) AS DOUBLE)
               / (MAX(n) * CAST(SUM(r) AS DOUBLE))
             - (MAX(n) + 1e0) / MAX(n), 6) AS gini
FROM ranked
"""


@register("revenue_gini", _REV_GINI_ORACLE)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across customers (Gini via the sorted
    rank-weighted formula; DECIMAL money so Σ rnk·r is exact) — the
    80/20 health metric; 0 = uniform spend, →1 = whale-dominated.

    Scale shape: the global rank comes from
    :func:`operators.prefix.range_row_number` (range shuffle, parallel
    local ranks, broadcast bases) — never a single-task
    ``Window.orderBy`` over the O(customers) table; the count rides a
    broadcast 1-row aggregate."""
    from .operators.prefix import range_row_number

    od = datasets.load_table(spark, sf_dir, "orders")
    rev = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = range_row_number(rev, [F.col("r"), F.col("o_custkey")], "rnk")
    n_tot = rev.groupBy().agg(F.count(F.lit(1)).alias("n"))
    return ranked.crossJoin(F.broadcast(n_tot)).agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum("r").cast("double").alias("total_revenue"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rnk") * F.col("r")).cast("double")
            / (F.max("n") * F.sum("r").cast("double"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# supplier risk propagation through the order graph
# ---------------------------------------------------------------------------

_RISK_ORACLE = """
WITH risky AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
exposed_lines AS (
  SELECT l_orderkey, l_suppkey,
         CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,6)) AS v
  FROM lineitem SEMI JOIN risky r ON l_suppkey = r.s_suppkey
)
SELECT CAST((SELECT COUNT(*) FROM risky) AS BIGINT) AS n_risky_suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_exposed_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exposed_orders,
       CAST(SUM(v) AS DOUBLE) AS exposed_revenue
FROM exposed_lines
"""


@register("supplier_risk_exposure", _RISK_ORACLE)
def q_supplier_risk_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk propagation: revenue flowing through suppliers in
    distress (negative account balance) — the supply-chain exposure
    rollup; one broadcast semi-join from the risk dim into the fact
    table, DECIMAL-exact money."""
    su = datasets.load_table(spark, sf_dir, "supplier")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    risky = su.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    n_risky = risky.count()
    exposed = li.join(
        F.broadcast(risky), li.l_suppkey == risky.s_suppkey, "left_semi"
    ).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
        .alias("v"),
    )
    return exposed.agg(
        F.lit(n_risky).cast("long").alias("n_risky_suppliers"),
        F.count("*").cast("long").alias("n_exposed_lines"),
        F.countDistinct("l_orderkey").cast("long").alias("n_exposed_orders"),
        F.sum("v").cast("double").alias("exposed_revenue"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartiles)
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate)) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS money
  FROM orders GROUP BY o_custkey
),
coded AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY last_us, o_custkey) AS r_q,
         NTILE(4) OVER (ORDER BY freq, o_custkey) AS f_q,
         NTILE(4) OVER (ORDER BY money, o_custkey) AS m_q
  FROM per_cust
)
SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment_code,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM coded GROUP BY 1
"""


@register("rfm_segments", _RFM_ORACLE)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile codes for recency,
    frequency, and monetary value (deterministic NTILE with custkey
    tie-break), rolled up to segment populations — the classic CRM
    partitioning; three ordered quantile codes over the per-customer
    aggregate (one row per customer, never the fact table).

    Scale shape: each quartile code is
    :func:`operators.prefix.range_ntile` (range shuffle + parallel
    local ranks + closed-form ntile), NOT a single-task
    ``ntile().over(Window.orderBy(...))``; the three codes re-join on
    custkey (three bounded shuffles of the O(customers) aggregate)."""
    from .operators.prefix import range_ntile

    od = datasets.load_table(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.max(F.unix_micros("o_orderdate")).alias("last_us"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("money"),
    ).localCheckpoint()
    r_q = range_ntile(
        per_cust.select("o_custkey", "last_us"),
        [F.col("last_us"), F.col("o_custkey")],
        4,
        "r_q",
    ).select("o_custkey", "r_q")
    f_q = range_ntile(
        per_cust.select("o_custkey", "freq"),
        [F.col("freq"), F.col("o_custkey")],
        4,
        "f_q",
    ).select("o_custkey", "f_q")
    m_q = range_ntile(
        per_cust.select("o_custkey", "money"),
        [F.col("money"), F.col("o_custkey")],
        4,
        "m_q",
    ).select("o_custkey", "m_q")
    coded = r_q.join(f_q, "o_custkey").join(m_q, "o_custkey")
    return (
        coded.select(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("long")
            .alias("segment_code")
        )
        .groupBy("segment_code")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

_RI_ORACLE = """
SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
FROM customer c WHERE NOT EXISTS
  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'supplier->nation', CAST(COUNT(*) AS BIGINT)
FROM supplier s WHERE NOT EXISTS
  (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
UNION ALL
SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'nation->region', CAST(COUNT(*) AS BIGINT)
FROM nation n WHERE NOT EXISTS
  (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
"""


@register("referential_integrity", _RI_ORACLE)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across every edge of the star schema —
    six anti-joins (dims broadcast), the constraint check a lakehouse
    runs because parquet will not; non-zero rows are the incident
    report."""
    t = {n: datasets.load_table(spark, sf_dir, n) for n in datasets.TABLES}

    def orphans(name, fact, fk, dim, pk):
        return (
            t[fact]
            .join(F.broadcast(t[dim].select(pk)), F.col(fk) == F.col(pk), "left_anti")
            .agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_orphans"),
            )
        )

    return (
        orphans("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
        .unionAll(orphans("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .unionAll(orphans("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
        .unionAll(orphans("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .unionAll(orphans("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"))
        .unionAll(orphans("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))
    )


# ---------------------------------------------------------------------------
# UNPIVOT (wide -> long) round-trip of the event-type matrix
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE event_type IN ('click', 'error', 'login', 'purchase', 'view')
GROUP BY 1, 2 HAVING COUNT(*) > 0
"""


@register("event_type_unpivot", _UNPIVOT_ORACLE)
def q_event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``stack``/UNPIVOT) applied to the pivoted
    per-user matrix, dropping structural zeros — the inverse of
    ``event_type_pivot``; round-tripping long→wide→long must land on
    the plain group-by, which is exactly what the oracle asserts."""
    ev = datasets.load_table(spark, sf_dir, "events")
    types = ["click", "error", "login", "purchase", "view"]
    wide = ev.groupBy("user_id").pivot("event_type", types).count()
    stack_expr = "stack({n}, {args}) as (event_type, n)".format(
        n=len(types),
        args=", ".join(f"'{t}', `{t}`" for t in types),
    )
    return (
        wide.select("user_id", F.expr(stack_expr))
        .filter(F.col("n").isNotNull() & (F.col("n") > 0))
        .select("user_id", "event_type", F.col("n").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# map aggregation surface: per-user type->count profile string
# ---------------------------------------------------------------------------

_MAPAGG_ORACLE = """
SELECT user_id,
       string_agg(event_type || ':' || n::VARCHAR, ',' ORDER BY event_type)
         AS profile
FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
) GROUP BY user_id
"""


@register("user_type_maps", _MAPAGG_ORACLE)
def q_user_type_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior profile exported as a canonical sorted
    ``type:count`` string — the map-typed feature column
    (``map_from_entries`` over sorted structs) serialized for
    cross-engine comparison; the map itself is what a feature store
    would keep."""
    ev = datasets.load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    return cnts.groupBy("user_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(event_type, n))),"
                " s -> concat(s.event_type, ':', cast(s.n as string)))"
            ),
            ",",
        ).alias("profile")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id (explicit multi-granularity report)
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus), ())
"""


@register("orders_grouping_sets", _GSETS_ORACLE)
def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (both margins, the crosstab, and the
    grand total in ONE pass) with ``grouping_id`` disambiguating
    NULL-vs-'ALL' — the multi-granularity report shape between plain
    ROLLUP (events_rollup) and full CUBE (corpus_cube)."""
    od = datasets.load_table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM _gs_orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus), ())
"""
    )


# ---------------------------------------------------------------------------
# order fulfillment lag with SLA breach rate
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
WITH lags AS (
  SELECT o.o_orderpriority AS priority,
         CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
              // 86400000000 AS BIGINT) AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
ranked AS (
  SELECT priority, lag_days,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY lag_days) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM lags
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(MIN(lag_days) AS BIGINT) AS min_days,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(n / 2.0) AS BIGINT)
                     THEN lag_days END) AS BIGINT) AS median_days,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT)
                     THEN lag_days END) AS BIGINT) AS p90_days,
       CAST((1000 * SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END))
            // MAX(n) AS BIGINT) AS breach_milli
FROM ranked GROUP BY priority
"""


@register("fulfillment_lag", _LAG_ORACLE)
def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag per priority: exact order-statistic median/p90
    of integer day lags plus the >90-day SLA breach rate in milli —
    the operations dashboard staple; one fact join, one per-priority
    sort, all-integer output."""
    od = datasets.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", F.col("o_orderpriority").alias("priority")
    )
    li = datasets.load_table(spark, sf_dir, "lineitem")
    lags = (
        li.join(F.broadcast(od), li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "priority",
            (
                (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate"))
                / F.lit(86400000000)
            )
            .cast("long")
            .alias("lag_days"),
        )
    )
    wp = Window.partitionBy("priority").orderBy("lag_days")
    wc = Window.partitionBy("priority")
    ranked = lags.select(
        "priority",
        "lag_days",
        F.row_number().over(wp).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_lines"),
            F.min("lag_days").cast("long").alias("min_days"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long"),
                    F.col("lag_days"),
                )
            )
            .cast("long")
            .alias("median_days"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 0.9).cast("long"),
                    F.col("lag_days"),
                )
            )
            .cast("long")
            .alias("p90_days"),
            F.expr(
                "(1000 * sum(case when lag_days > 90 then 1 else 0 end)) div max(n)"
            )
            .cast("long")
            .alias("breach_milli"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H classics (Q3 / Q8 / Q10 / Q13 / Q15 / Q17 / Q18), adapted to the
# testdata's column subset (no partsupp/shipmode/container/phone).
# Money discipline: DECIMAL(18,6) sums, DOUBLE only at the output edge.
# ---------------------------------------------------------------------------

_REV = "l_extendedprice * (1e0 - l_discount)"


@register(
    "q3_shipping_priority",
    f"""
WITH ranked AS (
  SELECT l.l_orderkey,
         CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch,
         o.o_orderpriority,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST({_REV} AS DECIMAL(18,6))) DESC, l.l_orderkey
         ) AS rank
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey, revenue, orderdate_epoch, o_orderpriority,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
""",
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-as-of-date revenue per order for one market
    segment, top 10.  Fact-fact join keyed on orderkey; both dims
    (filtered customer, dated orders) shrink before the lineitem join,
    DECIMAL-exact ranking with orderkey tie-break."""
    cust = datasets.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = datasets.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = datasets.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev_dec"))
    )
    # top-k via orderBy().limit → TakeOrderedAndProject over the
    # O(orders) aggregate; the rank window then covers 10 rows
    top = agg.orderBy(F.col("rev_dec").desc(), F.col("l_orderkey")).limit(10)
    w = Window.orderBy(F.col("rev_dec").desc(), F.col("l_orderkey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "l_orderkey",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.col("o_orderdate").cast("long").alias("orderdate_epoch"),
        "o_orderpriority",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "q8_market_share",
    f"""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST({_REV} AS DECIMAL(18,6)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM vol GROUP BY o_year
""",
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's yearly share of revenue sold
    into one customer region.  Star join with every dim broadcast;
    the share is a ratio of two DECIMAL-exact sums (one ROUND at the
    edge)."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    orders = datasets.load_table(spark, sf_dir, "orders")
    cust = datasets.load_table(spark, sf_dir, "customer")
    nat = datasets.load_table(spark, sf_dir, "nation")
    reg = datasets.load_table(spark, sf_dir, "region")
    sup = datasets.load_table(spark, sf_dir, "supplier")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    nvol = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)
    )
    tvol = F.sum("volume")
    return vol.groupBy("o_year").agg(
        nvol.cast("double").alias("nation_volume"),
        tvol.cast("double").alias("total_volume"),
        F.round(nvol.cast("double") / tvol.cast("double"), 6).alias("mkt_share"),
    )


@register(
    "q10_returned_items",
    f"""
WITH ranked AS (
  SELECT c.c_custkey, c.c_name, n.n_name AS nation,
         CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST({_REV} AS DECIMAL(18,6))) DESC, c.c_custkey
         ) AS rank
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
    AND o.o_orderdate < TIMESTAMP '1999-04-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT c_custkey, c_name, nation, revenue, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
""",
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a
    quarter, top 20 with their nation resolved — returns-triage
    report.  Quarter filter prunes orders before the fact join;
    customer/nation broadcast."""
    cust = datasets.load_table(spark, sf_dir, "customer")
    orders = datasets.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "1999-04-01")
    )
    li = datasets.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nat = datasets.load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("rev_dec"))
    )
    # top-k via orderBy().limit → TakeOrderedAndProject over the
    # O(customers) aggregate; the rank window then covers 20 rows
    top = agg.orderBy(F.col("rev_dec").desc(), F.col("c_custkey")).limit(20)
    w = Window.orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "c_custkey",
        "c_name",
        "nation",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "q13_customer_distribution",
    """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
""",
)
def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including the
    zero bucket (left join, count of non-null keys) — the classic
    two-level aggregation."""
    cust = datasets.load_table(spark, sf_dir, "customer")
    orders = datasets.load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count("*").cast("long").alias("custdist")
    )


@register(
    "q15_top_supplier",
    f"""
WITH srev AS (
  SELECT l.l_suppkey,
         SUM(CAST({_REV} AS DECIMAL(18,6))) AS total_rev
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1999-01-01'
    AND l.l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM srev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM srev)
""",
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum revenue in a
    quarter — view + scalar-max filter.  The max is a DECIMAL-exact
    comparison (no float ties); the supplier dim joins broadcast."""
    li = datasets.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "1999-04-01")
    )
    sup = datasets.load_table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.join(F.broadcast(mx), srev.total_rev == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
WITH pq AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem l GROUP BY l.l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7e0
         AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND 5 * CAST(l.l_quantity AS BIGINT) * pq.cnt < pq.sum_qty
""",
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders for one brand
    — lineitems below 20% of their part's average quantity.  The
    average test is integerized (``5·qty·cnt < Σqty``) so the filter
    is float-free and bit-identical cross-engine; the per-part
    aggregate joins back on partkey."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    part = datasets.load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == F.col("pk"))
        .filter(
            5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            F.count("*").cast("long").alias("n_items"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
        )
    )


@register(
    "q18_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 with their
    customers — the HAVING-on-fact-rollup shape.  The rollup is
    integer-exact; the surviving key set is tiny, so both subsequent
    joins broadcast the rollup side."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    orders = datasets.load_table(spark, sf_dir, "orders")
    cust = datasets.load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("long").alias("orderdate_epoch"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) data layout + file-skipping audit
# ---------------------------------------------------------------------------

_ZORDER_ORACLE = """
WITH mort AS MATERIALIZED (
  SELECT CAST(list_sum(list_transform(generate_series(0, 15), i ->
           ((l_partkey  >> i) & 1) * power(2, 2 * i)::BIGINT +
           ((l_suppkey >> i) & 1) * power(2, 2 * i + 1)::BIGINT))
         AS BIGINT) AS zkey,
         l_partkey AS a, l_suppkey AS b
  FROM lineitem
)
SELECT CAST(zkey >> 14 AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
       CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
       CAST(CASE WHEN MIN(a) <= 300 AND MAX(a) >= 100
                  AND MIN(b) <= 40 AND MAX(b) >= 10
            THEN 0 ELSE 1 END AS BIGINT) AS prunable
FROM mort GROUP BY 1
"""


@register("zorder_layout", _ZORDER_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout over ``(l_partkey,
    l_suppkey)`` plus the min/max file-skipping audit that justifies
    it: rows are binned by Morton-key prefix (one "file" per 2¹⁴
    z-range — pure arithmetic, no global sort), and each file carries
    per-column zone-map bounds; ``prunable`` marks files a rectangular
    predicate (a∈[100,300], b∈[10,40]) can skip entirely.  On a
    Z-ordered layout both dimensions prune multiplicatively — the
    Delta/Iceberg OPTIMIZE ZORDER story — whereas a single-column sort
    prunes only its leading dimension.  All bit math is JVM-side
    integer arithmetic; at 100 TB this is the writer-side clustering
    key and the reader-side skip statistic."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    zkey = F.expr(
        "aggregate(sequence(0, 15), 0L, (acc, i) ->"
        " acc + shiftleft((l_partkey >> i) & 1, 2 * i)"
        " + shiftleft((l_suppkey >> i) & 1, 2 * i + 1))"
    )
    mort = li.select(
        zkey.alias("zkey"),
        F.col("l_partkey").alias("a"),
        F.col("l_suppkey").alias("b"),
    )
    agg = mort.groupBy(F.shiftright("zkey", 14).cast("long").alias("file_id")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("a").cast("long").alias("min_a"),
        F.max("a").cast("long").alias("max_a"),
        F.min("b").cast("long").alias("min_b"),
        F.max("b").cast("long").alias("max_b"),
    )
    return agg.select(
        "file_id",
        "n_rows",
        "min_a",
        "max_a",
        "min_b",
        "max_b",
        F.when(
            (F.col("min_a") <= 300)
            & (F.col("max_a") >= 100)
            & (F.col("min_b") <= 40)
            & (F.col("max_b") >= 10),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("prunable"),
    )


# ---------------------------------------------------------------------------
# Join-size estimation audit (textbook uniformity estimate vs actual)
# ---------------------------------------------------------------------------

_JOIN_ESTIMATE_ORACLE = """
WITH sa AS (
  SELECT COUNT(*) AS n_orders, COUNT(DISTINCT o_orderkey) AS d_orders
  FROM orders
),
sb AS (
  SELECT COUNT(*) AS n_items, COUNT(DISTINCT l_orderkey) AS d_items
  FROM lineitem
),
act AS (
  SELECT COUNT(*) AS actual
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(a.n_orders AS BIGINT) AS n_orders,
       CAST(b.n_items AS BIGINT) AS n_items,
       CAST(a.d_orders AS BIGINT) AS d_orders,
       CAST(b.d_items AS BIGINT) AS d_items,
       CAST(c.actual AS BIGINT) AS actual_rows,
       CAST((a.n_orders * b.n_items) // GREATEST(a.d_orders, b.d_items)
            AS BIGINT) AS estimate_rows,
       CAST((1000 * (a.n_orders * b.n_items)
             // GREATEST(a.d_orders, b.d_items)) // c.actual AS BIGINT)
         AS ratio_milli
FROM sa a, sb b, act c
"""


@register("join_size_estimate", _JOIN_ESTIMATE_ORACLE)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-estimation audit for the orders ⋈ lineitem join:
    the textbook uniformity estimate ``|A|·|B| / max(d_A, d_B)``
    (what a cost-based optimizer assumes from NDV stats) against the
    actual join size, with the milli-ratio error.  The statistic every
    ANALYZE/CBO pipeline maintains — here exact, integer-only, one
    pass per side plus the counted join."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    sa = orders.agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderkey").alias("d_orders"),
    )
    sb = li.agg(
        F.count("*").alias("n_items"),
        F.countDistinct("l_orderkey").alias("d_items"),
    )
    act = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.count("*").alias("actual"))
    )
    return (
        sa.crossJoin(sb)
        .crossJoin(act)
        .select(
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_items").cast("long").alias("n_items"),
            F.col("d_orders").cast("long").alias("d_orders"),
            F.col("d_items").cast("long").alias("d_items"),
            F.col("actual").cast("long").alias("actual_rows"),
            F.expr("cast((n_orders * n_items) div greatest(d_orders, d_items) as long)")
            .alias("estimate_rows"),
            F.expr(
                "cast((1000 * ((n_orders * n_items) div greatest(d_orders, d_items)))"
                " div actual as long)"
            ).alias("ratio_milli"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 (local supplier volume): customer and supplier in the same
# nation, one region, one order year
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name,
       CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the supplier and the ordering
    customer share a nation, restricted to one region and order year.

    Scale shape: supplier/nation/region broadcast; customer is NOT
    hinted — at 100 TB it is far beyond broadcast range, so it
    shuffles on ``o_custkey`` (Catalyst/AQE still picks a broadcast at
    test scale on its own).  The remaining shuffles are
    lineitem⋈orders on orderkey and the final small group-by.  The
    nation-equality predicate rides the supplier join so no post-join
    filter blowup.  (Reference analog: the typed multi-way joins of
    ``tests/sqlite/test.c``.)"""
    cust = datasets.load_table(spark, sf_dir, "customer")
    orders = datasets.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = datasets.load_table(spark, sf_dir, "lineitem")
    sup = datasets.load_table(spark, sf_dir, "supplier")
    nat = datasets.load_table(spark, sf_dir, "nation")
    reg = datasets.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 (forecast revenue change): single-table scan-and-sum with a
# float-safe integerized discount band
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND CAST(round(l_discount * 100) AS INTEGER) BETWEEN 4 AND 6
  AND l_quantity < 24e0
""",
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be lost by dropping a discount band
    — a pure scan-aggregate.  The discount band test is integerized
    (``round(d*100)``) so the float boundary is bit-identical across
    engines; all three predicates push into the parquet scan and the
    whole query is one WholeStageCodegen stage with no shuffle beyond
    the single-row partial-agg gather."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.round(F.col("l_discount") * 100).cast("int").between(4, 6)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 (order priority; adapted): EXISTS semi-join on late-shipped
# lineitems — the dataset has no commit/receipt dates, so "late" is
# shipdate more than 60 days after the order date
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
""",
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: orders in one quarter having at least one
    lineitem shipped >60 days after the order date, counted per
    priority.  The EXISTS is a left-semi join (no duplicate
    amplification); the quarter filter shrinks orders before the
    shuffle and the ship-lag predicate rides the join condition.
    The synthetic schema has no commit/receipt dates (TESTDATA.md), so
    ship-lag replaces the commit<receipt test — semantics-preserving
    for the semi-join shape the reference exercises
    (``include/stinger.h:214-216`` has_typed_successor)."""
    orders = datasets.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = datasets.load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 (discounted revenue; adapted): disjunctive brand/size/
# quantity predicate over the part join
# ---------------------------------------------------------------------------


@register(
    "q19_discounted_revenue",
    f"""
SELECT CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
     (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
      AND l.l_quantity >= 1e0 AND l.l_quantity <= 11e0)
  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
      AND l.l_quantity >= 10e0 AND l.l_quantity <= 20e0)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
      AND l.l_quantity >= 20e0 AND l.l_quantity <= 30e0)
""",
)
def q_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (no shipmode/shipinstruct columns): revenue
    over a disjunction of three brand/size/quantity bands.  The
    brand∈{{1,2,3}} + size≤35 envelope of the OR is pushed onto the
    part side BEFORE the broadcast join (Catalyst keeps the residual
    disjunction as the join filter), so the broadcast table shrinks to
    the union of the bands rather than all parts."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    part = datasets.load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 35)
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20.0, 30.0)
        )
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 (global sales opportunity; adapted): above-average-balance
# customers with no orders, per nation — float-safe via
# cross-multiplied DECIMAL sums instead of a float AVG comparison
# ---------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    """
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS total,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer WHERE c_acctbal > 0e0
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.cnt > pos.total
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_nationkey
""",
)
def q_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone column → group by nationkey; the
    synthetic data gives every customer at least one order, so "never
    ordered" becomes "no order since 2000" to keep the anti-join
    non-vacuous): customers whose balance exceeds the mean positive
    balance and who have gone dormant, counted per nation.

    The above-average test is cross-multiplied (``bal·cnt > Σbal``)
    over DECIMAL sums so there is no float-division boundary to
    disagree on across engines.  The scalar (Σ,n) broadcasts; the
    no-orders test is a left-anti join on custkey (the reference's
    deletion/absence scan shape, ``operators/updates.py`` anti-join)."""
    cust = datasets.load_table(spark, sf_dir, "customer")
    orders = datasets.load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal).cast("decimal(28,2)").alias("total"),
        F.count("*").cast("long").alias("cnt"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("cnt") > F.col("total"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-01-01"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: top-2 customers per nation, one ANSI
# text executed verbatim by both engines
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_nationkey, t.c_custkey,
       CAST(FLOOR(t.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       t.rnk
FROM nation n,
LATERAL (
  SELECT c.c_custkey, c.c_acctbal,
         CAST(ROW_NUMBER() OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
              AS BIGINT) AS rnk
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 2
) t
"""


@register("lateral_topk_per_nation", _LATERAL_SQL)
def q_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-group top-k written the
    SQL-standard way and executed VERBATIM by both engines (Spark ≥3.2
    lateral joins; DuckDB lateral): for every nation, its two richest
    customers.  Catalyst decorrelates the lateral into the same
    window-ranked join the DataFrame formulation produces, so the
    declarative surface carries no plan penalty."""
    datasets.load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    datasets.load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# RANGE window frame over event time: trailing-hour per-user activity
# ---------------------------------------------------------------------------

_TRAILING_ORACLE = """
SELECT event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS BIGINT)
         AS value_milli_trailing
FROM (SELECT event_id, user_id, value,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("trailing_hour_activity", _TRAILING_ORACLE)
def q_trailing_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event TIME (not row count): for every
    event, the user's event count and milli-value sum in the trailing
    hour — the frame kind rate limiting and burst scoring need, where
    ROWS frames silently break on irregular event spacing.  One
    shuffle on user_id; the frame scan is sorted within partition.

    Frame semantics note: RANGE bounds with ties (equal timestamps)
    include ALL peer rows — both engines implement the SQL standard,
    so counts agree even where events share a second."""
    ev = datasets.load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("ts_s"),
        F.floor(F.col("value") * 1000).cast("long").alias("vm"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_trailing_hour"),
        F.sum("vm").over(w).cast("long").alias("value_milli_trailing"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit of order totals
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH bd AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
bc AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM bd GROUP BY digit),
bn AS (SELECT SUM(n) AS total FROM bc)
SELECT c.digit, c.n,
       CAST(FLOOR(1e6 * c.n / bn.total) AS BIGINT) AS observed_ppm,
       CAST(FLOOR(1e6 * LN(1e0 + 1e0 / c.digit) / LN(10e0)) AS BIGINT)
         AS benford_ppm
FROM bc c CROSS JOIN bn
"""


@register("benford_digit_audit", _BENFORD_ORACLE)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen: observed first-digit shares (ppm) next to
    the log10(1+1/d) expectation.  Digit extraction is exact string
    arithmetic on the floored total; only the final share divisions
    touch doubles (identical inputs → identical ppm)."""
    orders = datasets.load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    bd = orders.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    bc = bd.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    bn = bc.agg(F.sum("n").alias("total"))
    return bc.crossJoin(F.broadcast(bn)).select(
        "digit",
        "n",
        F.floor(F.lit(1e6) * F.col("n") / F.col("total")).cast("long").alias(
            "observed_ppm"
        ),
        F.floor(
            F.lit(1e6) * F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
        )
        .cast("long")
        .alias("benford_ppm"),
    )


# ---------------------------------------------------------------------------
# Pearson correlation numerators across lineitem numerics (exact)
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH ln_i AS (
  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS p,
         CAST(FLOOR(l_discount * 100) AS BIGINT) AS d,
         CAST(FLOOR(l_tax * 100) AS BIGINT) AS t
  FROM lineitem
),
pairs AS (
  SELECT 'q_p' AS pair, q AS x, p AS y FROM ln_i
  UNION ALL SELECT 'q_d', q, d FROM ln_i
  UNION ALL SELECT 'p_d', p, d FROM ln_i
  UNION ALL SELECT 'd_t', d, t FROM ln_i
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_xx,
       CAST(SUM(y * y) AS BIGINT) AS sum_yy
FROM pairs GROUP BY pair
"""


@register("lineitem_correlations", _CORR_ORACLE)
def q_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation SUFFICIENT STATISTICS for four lineitem
    numeric pairs — raw exact sums (n, Σx, Σy, Σxy, Σx², Σy²) over
    whole-dollar / percent-integerized columns.  ``r = (nΣxy−ΣxΣy)/
    √((nΣx²−Σx²)(nΣy²−Σy²))`` is downstream float math; the emitted
    statistics are BIGINT-exact, mergeable across partitions and
    snapshots, and sized so no n·Σ product is ever formed in LONG
    (whole dollars keep Σx² < 2⁶³ through sf 100)."""
    li = datasets.load_table(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").cast("long").alias("q"),
        F.floor("l_extendedprice").cast("long").alias("p"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("d"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    pairs = None
    for name, xc, yc in [("q_p", "q", "p"), ("q_d", "q", "d"), ("p_d", "p", "d"), ("d_t", "d", "t")]:
        part = li.select(
            F.lit(name).alias("pair"), F.col(xc).alias("x"), F.col(yc).alias("y")
        )
        pairs = part if pairs is None else pairs.unionAll(part)
    return pairs.groupBy("pair").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_yy"),
    )


# ---------------------------------------------------------------------------
# Holt double exponential smoothing over daily revenue (ordered fold)
# ---------------------------------------------------------------------------

_HOLT_ORACLE = """
WITH hd AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_epoch,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS rev_c
  FROM orders GROUP BY 1
),
hs AS (
  SELECT list(rev_c ORDER BY day_epoch) AS vs, COUNT(*) AS n_days FROM hd
),
hr AS (
  SELECT n_days,
         list_reduce(list_prepend([vs[1], CAST(0.0 AS DOUBLE)],
                                  list_transform(vs, x -> [x])),
           (acc, v) -> [v[1] / 2 + (acc[1] + acc[2]) / 2,
                        (v[1] / 2 + (acc[1] + acc[2]) / 2 - acc[1]) / 4
                          + acc[2] * 3 / 4]) AS lt
  FROM hs
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(FLOOR(lt[1]) AS BIGINT) AS level_cents,
       CAST(FLOOR(1000 * lt[2]) AS BIGINT) AS trend_millicents,
       CAST(FLOOR(lt[1] + 7 * lt[2]) AS BIGINT) AS forecast7_cents
FROM hr
"""


@register("holt_revenue_forecast", _HOLT_ORACLE)
def q_holt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level+trend, α=1/2, β=1/4)
    over the daily-revenue series, as an ORDERED fold — the smoothing
    constants are dyadic so every update is exact-or-identically-
    rounded IEEE arithmetic in the same order on both engines
    (the ``ewma_user_values`` discipline, with a 2-vector state).
    Emits the terminal level/trend and the 7-day-ahead forecast —
    the capacity-planning number a pipeline schedules against."""
    daily = (
        datasets.load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("double")
            .alias("rev_c")
        )
    )
    series = daily.groupBy().agg(
        F.expr(
            "transform(sort_array(collect_list(struct(day, rev_c))), s -> s.rev_c)"
        ).alias("vs"),
        F.count("*").cast("long").alias("n_days"),
    )
    fold = (
        "aggregate(vs, array(element_at(vs, 1), cast(0.0 as double)),"
        " (acc, v) -> array("
        "v / 2 + (acc[0] + acc[1]) / 2,"
        " (v / 2 + (acc[0] + acc[1]) / 2 - acc[0]) / 4 + acc[1] * 3 / 4))"
    )
    return series.select(
        "n_days", F.expr(fold).alias("lt")
    ).select(
        "n_days",
        F.floor(F.expr("lt[0]")).cast("long").alias("level_cents"),
        F.floor(F.lit(1000) * F.expr("lt[1]")).cast("long").alias("trend_millicents"),
        F.floor(F.expr("lt[0] + 7 * lt[1]")).cast("long").alias("forecast7_cents"),
    )


# ---------------------------------------------------------------------------
# Daily-revenue autocorrelation at lags 1 and 7 (exact lagged sums)
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
WITH ad AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) // 86400 AS day_no,
         SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
lags AS (
  SELECT 1 AS lag, a.rev AS x, b.rev AS y
  FROM ad a JOIN ad b ON b.day_no = a.day_no + 1
  UNION ALL
  SELECT 7, a.rev, b.rev
  FROM ad a JOIN ad b ON b.day_no = a.day_no + 7
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_xx,
       CAST(SUM(y * y) AS BIGINT) AS sum_yy
FROM lags GROUP BY lag
"""


@register("revenue_autocorrelation", _ACF_ORACLE)
def q_revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation sufficient statistics of daily revenue at lags
    1 and 7 (the weekly-seasonality probe): lagged day pairs by
    calendar-day equi-join (never a window over the whole series),
    whole-dollar integer sums so every statistic is BIGINT-exact and
    mergeable — downstream ``r(ℓ)`` is one float division, same
    contract as ``lineitem_correlations``."""
    ad = (
        datasets.load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.unix_micros(F.date_trunc("day", F.col("o_orderdate"))) / F.lit(86400000000))
            .cast("long")
            .alias("day_no")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("long")).alias("rev"))
        .localCheckpoint()
    )
    parts = []
    for lag in (1, 7):
        b = ad.select((F.col("day_no") - lag).alias("day_no"), F.col("rev").alias("y"))
        parts.append(
            ad.join(b, "day_no").select(
                F.lit(lag).alias("lag"), F.col("rev").alias("x"), "y"
            )
        )
    pairs = parts[0].unionAll(parts[1])
    return pairs.groupBy(F.col("lag").cast("long").alias("lag")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_yy"),
    )


# ---------------------------------------------------------------------------
# Trimmed mean order value per nation (exact order-statistic trim)
# ---------------------------------------------------------------------------

_TRIM_ORACLE = """
WITH tor AS (
  SELECT c.c_nationkey AS nation,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
trk AS (
  SELECT nation, cents,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY cents, cents) AS rn,
         COUNT(*) OVER (PARTITION BY nation) AS n
  FROM tor
),
tkeep AS (
  SELECT nation, cents, n FROM trk
  WHERE rn > n // 20 AND rn <= n - n // 20
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(cents) AS BIGINT) AS kept_sum_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
FROM tkeep GROUP BY nation
"""


@register("trimmed_mean_order_value", _TRIM_ORACLE)
def q_trimmed_mean_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean order value per nation — the robust-location
    statistic that survives the heavy order-value tail: rank within
    nation, drop ⌊n/20⌋ from each end, integer-exact kept sum and
    truncating-division mean.  Rank ties break on the value itself so
    equal cents are interchangeable (any tie order keeps the same
    multiset)."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    cust = datasets.load_table(spark, sf_dir, "customer")
    tor = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("nation").orderBy("cents")
    wn = Window.partitionBy("nation")
    trk = tor.select(
        "nation",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    keep = trk.filter(
        (F.col("rn") > F.expr("n div 20")) & (F.col("rn") <= F.col("n") - F.expr("n div 20"))
    )
    return keep.groupBy(F.col("nation").cast("long").alias("nation")).agg(
        F.max("n").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_kept"),
        F.sum("cents").cast("long").alias("kept_sum_cents"),
        F.expr("cast(sum(cents) div count(*) as long)").alias("trimmed_mean_cents"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification of parts by revenue
# ---------------------------------------------------------------------------

_ABC_ORACLE = """
WITH arev AS (
  SELECT l_partkey AS part,
         SUM(CAST(FLOOR(l_extendedprice * (1e0 - l_discount) * 100) AS BIGINT))
           AS rev_c
  FROM lineitem GROUP BY l_partkey
),
atot AS (SELECT SUM(rev_c) AS total FROM arev),
arnk AS (
  SELECT part, rev_c,
         SUM(rev_c) OVER (ORDER BY rev_c DESC, part) AS cum_c
  FROM arev
)
SELECT CAST(cls AS VARCHAR) AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_c) AS BIGINT) AS class_rev_cents
FROM (
  SELECT part, rev_c,
         CASE WHEN 100 * (cum_c - rev_c) < 80 * atot.total THEN 'A'
              WHEN 100 * (cum_c - rev_c) < 95 * atot.total THEN 'B'
              ELSE 'C' END AS cls
  FROM arnk CROSS JOIN atot)
GROUP BY cls
"""


@register("abc_revenue_classes", _ABC_ORACLE)
def q_abc_revenue_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC analysis of parts by revenue: class A until the
    cumulative share BEFORE the part reaches 80%, B to 95%, C beyond —
    thresholds cross-multiplied (``100·cum < 80·total``) so no float
    share is ever computed.  The classic inventory-prioritization
    rollup; one revenue aggregate + one ranked prefix sum.

    Scale shape: the global cumulative revenue is
    :func:`operators.prefix.range_prefix_sum` (range shuffle +
    parallel local scans + broadcast partition bases) in
    (rev desc, part) order — never a single-task ``Window.orderBy``
    over the O(parts) table."""
    from .operators.prefix import range_prefix_sum

    li = datasets.load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("rev_c")
    )
    tot = rev.agg(F.sum("rev_c").alias("total"))
    # exclusive prefix + own value = the inclusive running total
    ranked = (
        range_prefix_sum(
            rev, [F.desc("rev_c"), F.col("part")], "rev_c", "cum_excl"
        )
        .withColumn("cum_c", F.col("cum_excl") + F.col("rev_c"))
        .crossJoin(F.broadcast(tot))
    )
    cls = (
        F.when(
            100 * (F.col("cum_c") - F.col("rev_c")) < 80 * F.col("total"), F.lit("A")
        )
        .when(
            100 * (F.col("cum_c") - F.col("rev_c")) < 95 * F.col("total"), F.lit("B")
        )
        .otherwise(F.lit("C"))
    )
    return ranked.select(cls.alias("abc_class"), "rev_c").groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev_c").cast("long").alias("class_rev_cents"),
    )


# ---------------------------------------------------------------------------
# Order backlog over time (open orders per day, sweep-line)
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH bspan AS (
  SELECT o.o_orderkey,
         CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS d0,
         CAST(epoch(MAX(l.l_shipdate)) AS BIGINT) // 86400 AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
bev AS (
  SELECT d0 AS day, 1 AS delta FROM bspan
  UNION ALL SELECT d1 + 1, -1 FROM bspan
),
bday AS (SELECT day, SUM(delta) AS net FROM bev GROUP BY day),
bcum AS (
  SELECT day, SUM(net) OVER (ORDER BY day) AS backlog FROM bday
)
SELECT CAST(p.backlog AS BIGINT) AS peak_backlog,
       CAST(p.day AS BIGINT) AS peak_day,
       CAST((SELECT COUNT(*) FROM bcum) AS BIGINT) AS n_change_days
FROM (SELECT day, backlog FROM bcum ORDER BY backlog DESC, day LIMIT 1) p
"""


@register("order_backlog_peak", _BACKLOG_ORACLE)
def q_order_backlog_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak open-order backlog: an order is open from its order date
    until its last lineitem ships; the sweep-line (+1 at open, −1
    after close) prefix-sums daily deltas — O(distinct days) state,
    never per-order rows in the cumulative pass (the
    ``peak_concurrency`` shape on the fulfillment span).  Peak day
    ties resolve to the earliest day."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            (F.unix_micros("o_orderdate") / F.lit(86400000000)).cast("long").alias("d0"),
            ((F.unix_micros("last_ship") / F.lit(86400000000)).cast("long") + 1).alias(
                "d1"
            ),
        )
    )
    ev = span.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionAll(
        span.select(F.col("d1").alias("day"), F.lit(-1).alias("delta"))
    )
    bday = ev.groupBy("day").agg(F.sum("delta").alias("net"))
    # the sweep is day-granular (bounded calendar domain, O(10³)
    # rows), so its running sum is cheap; the peak pick is a top-1 via
    # orderBy().limit(1) → TakeOrderedAndProject, not a rank window
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bday.withColumn("backlog", F.sum("net").over(w))
    peak = cum.orderBy(F.desc("backlog"), "day").limit(1)
    n_days = cum.agg(F.count("*").alias("n"))
    return peak.crossJoin(F.broadcast(n_days)).select(
        F.col("backlog").cast("long").alias("peak_backlog"),
        F.col("day").cast("long").alias("peak_day"),
        F.col("n").cast("long").alias("n_change_days"),
    )


# ---------------------------------------------------------------------------
# Supplier market concentration (HHI) per nation
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH hrev AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
         SUM(CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount) * 100) AS BIGINT))
           AS rev_c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
htot AS (SELECT nation, SUM(rev_c) AS total FROM hrev GROUP BY nation)
SELECT CAST(r.nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(FLOOR(1e9 * (r.rev_c * 1e0 / t.total)
                           * (r.rev_c * 1e0 / t.total)) AS BIGINT)) AS BIGINT)
         AS hhi_nano
FROM hrev r JOIN htot t USING (nation)
GROUP BY r.nation
"""


@register("supplier_hhi", _HHI_ORACLE)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation (Σ share², nano-quantized per supplier before the
    integer sum — order-independent despite the float shares): the
    single-vendor-risk companion to ``supplier_risk_exposure`` —
    hhi_nano → 1e9 means one supplier owns the nation's volume."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    sup = datasets.load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("rev_c")
        )
    )
    tot = rev.groupBy("nation").agg(F.sum("rev_c").alias("total"))
    share = F.col("rev_c") * F.lit(1.0) / F.col("total")
    return (
        rev.join(F.broadcast(tot), "nation")
        .select("nation", F.floor(F.lit(1e9) * share * share).cast("long").alias("h"))
        .groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.sum("h").cast("long").alias("hhi_nano"),
        )
    )


# ---------------------------------------------------------------------------
# Order-key sequence gap audit (gaps-and-islands data quality)
# ---------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH gk AS (SELECT DISTINCT o_orderkey AS k FROM orders),
gnb AS (
  SELECT k,
         k - LAG(k) OVER (ORDER BY k) AS delta
  FROM gk
),
ggaps AS (
  SELECT k - delta + 1 AS gap_start, k - 1 AS gap_end, delta - 1 AS gap_len
  FROM gnb WHERE delta > 1
)
SELECT CAST((SELECT COUNT(*) FROM gk) AS BIGINT) AS n_keys,
       CAST((SELECT MAX(k) - MIN(k) + 1 FROM gk) AS BIGINT) AS span,
       CAST((SELECT COUNT(*) FROM ggaps) AS BIGINT) AS n_gaps,
       CAST(COALESCE((SELECT SUM(gap_len) FROM ggaps), 0) AS BIGINT)
         AS missing_keys,
       CAST(COALESCE((SELECT MAX(gap_len) FROM ggaps), 0) AS BIGINT)
         AS widest_gap
"""


@register("orderkey_gap_audit", _GAPS_ORACLE)
def q_orderkey_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit of order keys (gaps-and-islands): how many
    keys exist vs the id span, how many holes, the total and widest
    missing ranges — the ingestion-loss / sequence-integrity check a
    pipeline runs after every load.

    Scale shape: the global lag comes from
    :func:`operators.prefix.range_lag` (range shuffle + parallel local
    lags + a one-row-per-partition boundary patch) — never a
    single-task ``Window.orderBy`` over the O(orders) key set."""
    from .operators.prefix import range_lag

    ok = (
        datasets.load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    nb = range_lag(ok, [F.col("k")], "k", "_prev").withColumn(
        "delta", F.col("k") - F.col("_prev")
    )
    gaps = nb.filter(F.col("delta") > 1).select((F.col("delta") - 1).alias("gap_len"))
    base = ok.agg(
        F.count("*").cast("long").alias("n_keys"),
        (F.max("k") - F.min("k") + 1).cast("long").alias("span"),
    )
    gagg = gaps.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap_len"), F.lit(0)).cast("long").alias("missing_keys"),
        F.coalesce(F.max("gap_len"), F.lit(0)).cast("long").alias("widest_gap"),
    )
    return base.crossJoin(gagg)


# ---------------------------------------------------------------------------
# Hour-of-day activity profile per event type (diurnal shape)
# ---------------------------------------------------------------------------

_HOURPROFILE_ORACLE = """
SELECT event_type,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
GROUP BY event_type, EXTRACT(hour FROM ts)
"""


@register("hour_of_day_profile", _HOURPROFILE_ORACLE)
def q_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal activity shape: counts and exact milli-value sums per
    (event type, hour-of-day) — the 24-bucket profile behind
    load-aware scheduling and anomaly baselines (the hour-of-day
    sibling of ``weekday_activity``).  One map-side-combined
    aggregate of ≤ types×24 groups."""
    ev = datasets.load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("value_milli"),
    )


# ---------------------------------------------------------------------------
# Revenue rank movers: part rank shift between timeline halves
# ---------------------------------------------------------------------------

_MOVERS_ORACLE = """
WITH msplit AS (
  SELECT CAST((MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate))) // 2
              AS BIGINT) AS mid
  FROM orders
),
mrev AS (
  SELECT l.l_partkey AS part,
         CASE WHEN epoch_us(o.o_orderdate) < m.mid THEN 0 ELSE 1 END AS half,
         SUM(CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount) * 100) AS BIGINT))
           AS rev_c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  CROSS JOIN msplit m
  GROUP BY 1, 2
),
mrk AS (
  SELECT part, half, rev_c,
         ROW_NUMBER() OVER (PARTITION BY half ORDER BY rev_c DESC, part) AS rnk
  FROM mrev
),
mboth AS (
  SELECT a.part, a.rnk AS rank_h1, b.rnk AS rank_h2,
         a.rev_c AS rev_h1, b.rev_c AS rev_h2
  FROM (SELECT * FROM mrk WHERE half = 0) a
  JOIN (SELECT * FROM mrk WHERE half = 1) b USING (part)
)
SELECT part, rank_h1, rank_h2,
       CAST(rank_h1 - rank_h2 AS BIGINT) AS rank_gain,
       CAST(rev_h1 AS BIGINT) AS rev_h1, CAST(rev_h2 AS BIGINT) AS rev_h2
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(rank_h1 - rank_h2) DESC, part) AS mo
  FROM mboth)
WHERE mo <= 20
"""


@register("revenue_rank_movers", _MOVERS_ORACLE)
def q_revenue_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest part-revenue RANK shifts between the first and second
    half of the order timeline — trend detection by exact rank delta
    (ranks from integer cent sums, midpoint split from the data's own
    epoch bounds, the ``activity_churn`` discipline).  Top 20 by
    absolute shift, ties to the smaller part key."""
    orders = datasets.load_table(spark, sf_dir, "orders")
    li = datasets.load_table(spark, sf_dir, "lineitem")
    bounds = orders.agg(
        ((F.min(F.unix_micros("o_orderdate")) + F.max(F.unix_micros("o_orderdate"))) / 2)
        .cast("long")
        .alias("mid")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col("l_partkey").alias("part"),
            (F.unix_micros("o_orderdate") >= F.col("mid")).cast("int").alias("half"),
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
            ).cast("long").alias("cents"),
        )
        .groupBy("part", "half")
        .agg(F.sum("cents").alias("rev_c"))
    )
    # per-half exact ranks via the distributed two-level rank (a
    # partitionBy("half") window is a 2-task sort of the whole parts
    # table); the mover shortlist is orderBy().limit(20) →
    # TakeOrderedAndProject
    from .operators.prefix import range_row_number

    rev = rev.localCheckpoint()
    a = range_row_number(
        rev.filter(F.col("half") == 0),
        [F.desc("rev_c"), F.col("part")],
        "rank_h1",
    ).select("part", "rank_h1", F.col("rev_c").alias("rev_h1"))
    b = range_row_number(
        rev.filter(F.col("half") == 1),
        [F.desc("rev_c"), F.col("part")],
        "rank_h2",
    ).select("part", "rank_h2", F.col("rev_c").alias("rev_h2"))
    both = a.join(b, "part")
    return (
        both.orderBy(F.abs(F.col("rank_h1") - F.col("rank_h2")).desc(), "part")
        .limit(20)
        .select(
            "part",
            F.col("rank_h1").cast("long").alias("rank_h1"),
            F.col("rank_h2").cast("long").alias("rank_h2"),
            (F.col("rank_h1") - F.col("rank_h2")).cast("long").alias("rank_gain"),
            "rev_h1",
            "rev_h2",
        )
    )


# ---------------------------------------------------------------------------
# Order-total reconciliation vs lineitem roll-up (financial audit)
# ---------------------------------------------------------------------------

_RECON_ORACLE = """
WITH rsum AS (
  SELECT l_orderkey AS k,
         SUM(CAST(FLOOR(l_extendedprice * (1e0 + l_tax) * (1e0 - l_discount)
                        * 100) AS BIGINT)) AS computed_c
  FROM lineitem GROUP BY l_orderkey
),
rcmp AS (
  SELECT o.o_orderstatus AS status,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS stated_c,
         r.computed_c
  FROM orders o JOIN rsum r ON r.k = o.o_orderkey
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ABS(stated_c - computed_c) <= 100
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dollar,
       CAST(SUM(ABS(stated_c - computed_c)) AS BIGINT) AS abs_diff_cents,
       CAST(MAX(ABS(stated_c - computed_c)) AS BIGINT) AS worst_diff_cents
FROM rcmp GROUP BY status
"""


@register("order_total_reconciliation", _RECON_ORACLE)
def q_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation: the stated ``o_totalprice`` against
    the lineitem roll-up ``Σ price·(1+tax)·(1−disc)``, in exact cents
    per order status — the ledger-vs-detail audit every warehouse
    runs.  One per-order integer aggregate joined back to orders;
    diffs are exact cents (the synthetic generator's pricing model is
    itself under test here — honest diffs, not assumed zeros)."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    orders = datasets.load_table(spark, sf_dir, "orders")
    rs = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1.0) + F.col("l_tax"))
                * (F.lit(1.0) - F.col("l_discount"))
                * 100
            ).cast("long")
        ).alias("computed_c")
    )
    cmpd = orders.join(rs, orders.o_orderkey == F.col("k")).select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("stated_c"),
        "computed_c",
    )
    diff = F.abs(F.col("stated_c") - F.col("computed_c"))
    return cmpd.groupBy("status").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum((diff <= 100).cast("long")).cast("long").alias("n_within_dollar"),
        F.sum(diff).cast("long").alias("abs_diff_cents"),
        F.max(diff).cast("long").alias("worst_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Co-returned part pairs (defect-affinity basket analysis)
# ---------------------------------------------------------------------------

_CORETURN_ORACLE = """
WITH cr AS (
  SELECT DISTINCT l_orderkey AS k, l_partkey AS part
  FROM lineitem WHERE l_returnflag = 'R'
),
crp AS (
  SELECT a.part AS part_a, b.part AS part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM cr a JOIN cr b ON a.k = b.k AND a.part < b.part
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT part_a, part_b, n_orders,
         ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rnk
  FROM crp)
WHERE rnk <= 20
"""


@register("co_returned_parts", _CORETURN_ORACLE)
def q_co_returned_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs most often RETURNED in the same order — the
    defect-affinity twin of ``frequent_type_pairs`` (correlated
    returns point at a shared supplier batch or bundling flaw).
    The returned-lineitem filter pushes to the scan, the pair join
    keys on orderkey (bounded per-order fan-out), top-20 by support
    with deterministic tie-break."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    cr = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    a = cr.alias("a")
    b = cr.alias("b")
    crp = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    # top-k via orderBy().limit → TakeOrderedAndProject over the
    # O(pairs) table; the rank window then covers 20 rows
    top = crp.orderBy(F.desc("n_orders"), "part_a", "part_b").limit(20)
    w = Window.orderBy(F.desc("n_orders"), "part_a", "part_b")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Supplier delivery-speed scorecard (exact median ship lag)
# ---------------------------------------------------------------------------

_SHIPLAG_ORACLE = """
WITH sl AS (
  SELECT l.l_suppkey AS supp,
         CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
              AS BIGINT) AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
sr AS (
  SELECT supp, lag_days,
         ROW_NUMBER() OVER (PARTITION BY supp ORDER BY lag_days, lag_days) AS rn,
         COUNT(*) OVER (PARTITION BY supp) AS n
  FROM sl
)
SELECT CAST(supp AS BIGINT) AS supp, CAST(MAX(n) AS BIGINT) AS n_items,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS BIGINT)
         AS median_lag_days,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS BIGINT)
         AS p90_lag_days,
       CAST(MAX(lag_days) AS BIGINT) AS worst_lag_days
FROM sr GROUP BY supp
"""


@register("supplier_ship_lag", _SHIPLAG_ORACLE)
def q_supplier_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier delivery scorecard: exact lower-median, p90 (rank
    ``⌈9n/10⌉``) and worst ship lag in days — the vendor SLA ranking
    (the supplier slice of ``fulfillment_lag``).  Pure order
    statistics on integer day lags, one partitioned rank window."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    orders = datasets.load_table(spark, sf_dir, "orders")
    sl = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("supp"),
        (
            (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate"))
            / F.lit(86400000000)
        )
        .cast("long")
        .alias("lag_days"),
    )
    w = Window.partitionBy("supp").orderBy("lag_days")
    wn = Window.partitionBy("supp")
    sr = sl.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    return sr.groupBy(F.col("supp").cast("long").alias("supp")).agg(
        F.max("n").cast("long").alias("n_items"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("lag_days")))
        .cast("long")
        .alias("median_lag_days"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("lag_days")))
        .cast("long")
        .alias("p90_lag_days"),
        F.max("lag_days").cast("long").alias("worst_lag_days"),
    )


# ---------------------------------------------------------------------------
# Supplier returns-rate scorecard (complement to ship lag)
# ---------------------------------------------------------------------------

_RETRATE_ORACLE = """
SELECT CAST(l_suppkey AS BIGINT) AS supp,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_cents,
       CAST(FLOOR(1e6 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  / COUNT(*)) AS BIGINT) AS return_ppm
FROM lineitem GROUP BY l_suppkey
"""


@register("supplier_return_rates", _RETRATE_ORACLE)
def q_supplier_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier return rates by item count and revenue — the
    quality half of the vendor scorecard next to
    ``supplier_ship_lag``.  One conditional aggregate, exact cents,
    ppm share quantized from exact integers."""
    li = datasets.load_table(spark, sf_dir, "lineitem")
    ret = (F.col("l_returnflag") == "R").cast("long")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    return li.groupBy(F.col("l_suppkey").cast("long").alias("supp")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(ret).cast("long").alias("n_returned"),
        F.sum(cents).cast("long").alias("rev_cents"),
        F.sum(F.when(F.col("l_returnflag") == "R", cents).otherwise(0))
        .cast("long")
        .alias("returned_cents"),
        F.floor(F.lit(1e6) * F.sum(ret) / F.count("*"))
        .cast("long")
        .alias("return_ppm"),
    )
