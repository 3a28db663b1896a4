"""The declared query inventory (SURVEY.md §2d-§2g).

Each entry pairs an idiomatic-Spark implementation (DataFrame API —
Catalyst plans the physical strategy) with an ANSI-SQL oracle string
DuckDB runs on the same parquet tables. The driver hash-compares
values with columns sorted by name, so BOTH sides alias every computed
column identically and round floating aggregates identically (fp
summation order differs between engines; rounding collapses ulp
noise).

Scale notes per query are inline — the plan shapes are chosen for the
1000-executor / 100 TB case (broadcast dims, partial aggs, single
shuffle per agg/join, window partitioning on high-cardinality keys),
then validated locally with .explain().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with usable time columns.

    Two physical layouts of ``events.ts`` are handled, both seen from
    the driver's generators:
    - int64 TIMESTAMP(NANOS) read via ``nanosAsLong`` → bigint nanos;
    - TIMESTAMP(MICROS) without UTC-adjustment metadata → timestamp_ntz.

    Integer division keeps conversions exact (a double round-trip of an
    ns epoch loses ~hundreds of ns):
    - ``ts``  — microsecond TimestampType (what Spark itself would
      produce for µs data; usable by F.window / watermarks)
    - ``sec`` — floor-seconds epoch, matching DuckDB floor(epoch(ts))
    """
    e = t(spark, sf_dir, "events")
    dt = dict(e.dtypes)["ts"]
    if dt in ("bigint", "long"):
        return e.withColumns(
            {
                "sec": F.expr("ts div 1000000000"),
                "ts": F.timestamp_micros(F.expr("ts div 1000")),
            }
        )
    if dt == "timestamp_ntz":
        # The NTZ wall-clock is the UTC instant. Pure NTZ arithmetic
        # (timestampdiff against the NTZ epoch) yields epoch micros with
        # no session-timezone dependence — a caller with an unpinned
        # SparkSession gets the same epochs as the UTC-pinned factory in
        # session.py (an NTZ->timestamp CAST would not: it reinterprets
        # the wall-clock in the session zone).
        us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        return e.withColumns(
            {
                "sec": F.expr(f"({us}) div 1000000"),
                "ts": F.timestamp_micros(F.expr(us)),
            }
        )
    return e.withColumn("sec", F.unix_timestamp("ts"))


# ---------------------------------------------------------------------------
# Grouped aggregation (§2d)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter (pushed to parquet) -> partial agg
    (map-side combine) -> single shuffle on 6 grouping values -> final agg.
    Low-cardinality groups: AQE coalesces post-shuffle partitions."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_grouped_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg with exact COUNT(DISTINCT): Catalyst expands to a
    two-phase aggregate (distinct keys shuffled once, then re-agg)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


ORACLE_GROUPED_DISTINCT = """
SELECT o_orderpriority,
       count(*)                     AS n_orders,
       count(DISTINCT o_custkey)    AS n_custs,
       round(sum(o_totalprice), 2)  AS sum_price
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Joins (§2e)
# ---------------------------------------------------------------------------


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(orders) x dims(customer, nation, region).
    Dims broadcast (region/nation are tiny; customer fits the 32 MB
    threshold at bench scale — at 100 TB customer would shuffle-join,
    which AQE decides at runtime). One shuffle for the final agg."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


ORACLE_REVENUE_BY_NATION = """
SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact-dim join: lineitem x part (broadcast) x supplier
    (broadcast); group on p_brand."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


ORACLE_BRAND_VOLUME = """
SELECT p_brand, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (EXISTS / NOT EXISTS): customers with vs
    without orders, tagged and unioned. At scale both are one shuffle
    on the join key (or broadcast if the key set is small); the
    reference's only join-like op (K4 upsert) is the anti branch."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    active = c.join(o, "c_custkey", "left_semi").select(
        F.lit("active").alias("tag"), "c_custkey", "c_name"
    )
    inactive = c.join(o, "c_custkey", "left_anti").select(
        F.lit("inactive").alias("tag"), "c_custkey", "c_name"
    )
    return active.unionByName(inactive)


ORACLE_SEMI_ANTI = """
SELECT 'active' AS tag, c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'inactive' AS tag, c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Window functions (§2f)
# ---------------------------------------------------------------------------


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer. One shuffle on
    o_custkey (high-cardinality -> even distribution); rank pushdown
    (WindowGroupLimit) keeps per-partition heaps small."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: running sum + lag over order history per
    customer. Frame is rowsBetween(unboundedPreceding, current)."""
    o = t(spark, sf_dir, "orders").withColumn(
        "o_orderdate_d", F.col("o_orderdate").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate_d", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
        F.count("*").over(run).alias("running_n"),
        F.datediff(
            F.col("o_orderdate_d"), F.lag("o_orderdate_d").over(w)
        ).alias("days_since_prev"),
    )


ORACLE_RUNNING_TOTALS = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w2, 2) AS running_total,
       count(*) OVER w2 AS running_n,
       CAST(date_diff('day',
            lag(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Rollup / cube / distinct / set ops / top-k (§2d, §2f)
# ---------------------------------------------------------------------------


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over yearly active-customer sets.
    Spark plans these as aggregates + joins; both inputs are one scan
    each (year filter pushed down)."""
    o = t(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    both = y96.intersect(y97).select(F.lit("both").alias("tag"), "o_custkey")
    only96 = y96.exceptAll(y97).select(F.lit("only_1996").alias("tag"), "o_custkey")
    only97 = y97.exceptAll(y96).select(F.lit("only_1997").alias("tag"), "o_custkey")
    return both.unionByName(only96).unionByName(only97)


ORACLE_SET_OPS = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
     y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1996' AS tag, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1997' AS tag, o_custkey FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: agg then orderBy().limit() -> Catalyst plans
    TakeOrderedAndProject (per-partition heaps, no full sort).
    Ranking uses the rounded value + key tie-break so both engines
    pick an identical, deterministic top-10."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, revenue, n_orders
FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      FROM orders GROUP BY o_custkey)
JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Row-level transform showcase + JSON scalar (§2c/§2g on the events table)
# ---------------------------------------------------------------------------


def q_events_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's row-transform vocabulary (domain guard T3/T11,
    null-fill T8, upper T10, date extraction T6, JSON scalar) applied
    to the events table — all narrow column expressions."""
    from nypd_arrest_etl_spark.functions import domain_guard

    e = events_with_ts(spark, sf_dir)
    return (
        e.select(
            domain_guard("event_type", ("CLICK", "VIEW", "PURCHASE"), "OTHER").alias("event_class"),
            F.col("ts").cast("date").alias("day"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
            F.get_json_object("props", "$.k").alias("k"),
        )
        .groupBy("event_class", "day")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("v"), 2).alias("sum_value"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


ORACLE_EVENTS_CLEAN = """
SELECT CASE WHEN upper(event_type) IN ('CLICK','VIEW','PURCHASE')
            THEN upper(event_type) ELSE 'OTHER' END AS event_class,
       CAST(ts AS DATE) AS day,
       count(*) AS n,
       round(sum(coalesce(value, 0.0)), 2) AS sum_value,
       count(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Time windows & sessionization (§2h batch equivalents)
# ---------------------------------------------------------------------------


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window via F.window (epoch-aligned); start exported
    as epoch seconds so both engines hash identical integers.

    sum/avg are computed in FIXED POINT (values live on a 2-decimal
    grid; sum integer cents, divide once) — the same exactness trick as
    resample_interpolate. A float sum is summation-order dependent, so
    a double `avg` can land a half-way case on different sides of the
    6th decimal across engines: the two-scale compare caught exactly
    one such row at sf0.1 (43.4728125 rounding to ...12 vs ...13).

    Null semantics: `avg_value` is NULL-IGNORING like F.avg — the
    divisor is count(value) (non-null count), not count(*), and a
    window whose values are all null averages to null (round-3 ADVICE:
    dividing by n silently changed avg semantics for null values)."""
    e = events_with_ts(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("_cents"),
            F.count("value").alias("_nv"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            F.round(F.col("_cents") / 100.0, 2).alias("sum_value"),
            F.when(
                F.col("_nv") > 0,
                F.round(F.col("_cents") / (100.0 * F.col("_nv")), 6),
            ).alias("avg_value"),
        )
    )


ORACLE_TUMBLING_HOURLY = """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       event_type, count(*) AS n,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value,
       round(sum(CAST(round(value * 100) AS BIGINT))
             / (100.0 * nullif(count(value), 0)), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


def q_sliding_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (24h window, 6h slide) — each event lands in 4
    windows; F.window handles the replication JVM-side."""
    e = events_with_ts(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "24 hours", "6 hours").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n", "sum_value")
    )


ORACLE_SLIDING_DAILY = """
WITH shifted AS (
  SELECT CAST(floor((epoch(ts) - 21600 * s.i) / 86400) * 86400 + 21600 * s.i AS BIGINT)
           AS window_start,
         value
  FROM events, (SELECT unnest(generate_series(0, 3)) AS i) s
)
SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM shifted GROUP BY 1
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min inactivity gap via lag + running
    sum of session-break flags. One shuffle on user_id; the streaming
    twin is session_window in streaming/pipeline.py. Gaps are computed
    on floor-second epochs so both engines see identical integers."""
    e = events_with_ts(spark, sf_dir).select("user_id", "event_id", "sec")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("sec") - F.lag("sec").over(w)
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(run))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("sec").alias("session_start"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
    )


ORACLE_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), flagged AS (
  SELECT user_id, sec,
         CASE WHEN sec - lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
), sessions AS (
  SELECT user_id, sec,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY sec
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(sec) AS session_start, max(sec) - min(sec) AS duration_s
FROM sessions GROUP BY user_id, session_id
"""


def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in F.session_window in BATCH mode (the same operator the
    streaming path uses) — 30-min-gap sessions per user. The oracle
    replays the gap semantics with the lag/running-sum rewrite, so
    this also PROVES the built-in and the manual sessionization
    (q_sessionize) agree. One shuffle on user_id.

    Sessions are defined on the SECOND-truncated event time — the same
    integer timeline the manual sessionizer and the oracle use (at
    microsecond precision a pair ~1799.6 s apart merges here while the
    integer oracle splits it). The boundary rule is the native
    operator's: Spark's session window is INCLUSIVE of its end, so an
    event landing exactly gap seconds after the last one EXTENDS the
    session (probed empirically; the manual q_sessionize splits at
    >= gap — one second of boundary difference, each pair oracle-
    verified under its own rule; the two-scale compare caught exactly
    one exact-1800s pair at sf0.1). Session values sum in fixed point
    (integer cents) so float summation order can't move a half-way
    rounding case across engines."""
    e = events_with_ts(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    cents = F.round(F.coalesce("value", F.lit(0.0)) * 100).cast("long")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            F.round(F.col("_cents") / 100.0, 2).alias("sum_value"),
        )
    )


ORACLE_SESSION_WINDOW_BATCH = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(round(coalesce(value, 0.0) * 100) AS BIGINT) AS cents
  FROM events
), flagged AS (
  SELECT user_id, sec, cents,
         CASE WHEN sec - lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
), sessions AS (
  SELECT user_id, sec, cents,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY sec
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(sec) AS session_start,
       count(*) AS n_events, round(sum(cents) / 100.0, 2) AS sum_value
FROM sessions GROUP BY user_id, sid
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both fact sides pushed to
    the scans, customer broadcast, lineitem-orders join shuffles on
    orderkey, top-10 by revenue via TakeOrderedAndProject."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the JSON props column via the
    VARIANT type (parse once, typed access after) — per event_type
    stats of the numeric $.k property."""
    e = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "double")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.round(F.min("k"), 2).alias("min_k"),
            F.round(F.max("k"), 2).alias("max_k"),
        )
    )


ORACLE_PROPS_VARIANT = """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS DOUBLE)) AS n_with_k,
       round(avg(CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS avg_k,
       round(min(CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS min_k,
       round(max(CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS max_k
FROM events GROUP BY event_type
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point (SURVEY §3.4 surface 3): identical
    SQL text runs on the registered views in both engines. GROUPING
    SETS plans as one Expand + single shuffle, same as cube/rollup."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ---------------------------------------------------------------------------
# Temporal joins (§2e absent-category: as-of / range)
# ---------------------------------------------------------------------------


def q_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before
    it (backward inclusive as-of). Union+window — one shuffle, no
    nested-loop join (operators/temporal.py)."""
    from nypd_arrest_etl_spark.operators.temporal import asof_join

    e = events_with_ts(spark, sf_dir).select("event_id", "user_id", "event_type", "value", "sec")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "sec")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "sec", "value")
    out = asof_join(purchases, clicks, on="sec", by="user_id", value_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "sec",
        F.col("asof_sec").alias("click_sec"),
        F.round("asof_value", 2).alias("click_value"),
    )


ORACLE_ASOF = """
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, sec, value FROM e WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.sec,
       c.sec AS click_sec, round(c.value, 2) AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.sec >= c.sec
"""


def q_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 5 minutes — interval join via
    time-bucket equi-join (operators/temporal.py), not a theta BNLJ."""
    from nypd_arrest_etl_spark.operators.temporal import range_pair_join

    e = events_with_ts(spark, sf_dir)
    return range_pair_join(e, gap=300, ts_col="sec", key_col="user_id", id_col="event_id")


ORACLE_RANGE_PAIRS = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
)
SELECT a.user_id, a.event_id AS id_1, b.event_id AS id_2, b.sec - a.sec AS dt
FROM e a JOIN e b
  ON a.user_id = b.user_id AND b.sec - a.sec > 0 AND b.sec - a.sec <= 300
"""


# ---------------------------------------------------------------------------
# Grouped Python-UDF surface (§2i)
# ---------------------------------------------------------------------------


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nypd_arrest_etl_spark.operators.grouped import embedding_centroids

    return embedding_centroids(t(spark, sf_dir, "embeddings"), n_groups=10)


ORACLE_CENTROIDS = """
WITH u AS (
  SELECT vec_id % 10 AS grp, s.i AS dim,
         CAST(embedding[s.i + 1] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1)) AS i) s
)
SELECT grp, CAST(dim AS INT) AS dim, round(avg(x), 6) AS centroid
FROM u GROUP BY 1, 2
"""


def q_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow surface (§2i): per-priority order stats reduced
    with pyarrow.compute kernels — no pandas conversion either side."""
    from nypd_arrest_etl_spark.operators.grouped import group_stats_arrow

    return group_stats_arrow(
        t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


ORACLE_ARROW_GROUP_STATS = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total,
       min(o_totalprice) AS vmin, max(o_totalprice) AS vmax
FROM orders GROUP BY o_orderpriority
"""


def q_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nypd_arrest_etl_spark.operators.grouped import grouped_median

    return grouped_median(
        t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice", out_col="median_price"
    )


ORACLE_MEDIAN_PRICE = """
SELECT o_orderpriority, round(median(o_totalprice), 2) AS median_price
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Pivot / explode / percentiles / ntile / decorrelated subquery
# (§2d grouped-agg family + §2f windows + §4 "subquery decorrelation")
# ---------------------------------------------------------------------------


def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per order-year x status. Passing the pivot
    values explicitly skips the extra distinct-collect job Spark would
    otherwise run to discover them — at 100 TB that discovery pass is
    a full scan, so enumerating the (tiny, known) domain matters.
    Plans as one partial+final aggregate, single shuffle on o_year."""
    o = t(spark, sf_dir, "orders")
    p = (
        o.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_year",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


ORACLE_PIVOT_STATUS = """
SELECT CAST(year(o_orderdate) AS INT)              AS o_year,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY 1
"""


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode: tokenize documents (same [a-z0-9]+ regex both
    engines), count terms, global top-20 with a total tie-break order.
    Generate(explode) stays inside the scan stage (narrow); the only
    shuffle is the term agg; top-k plans as TakeOrderedAndProject —
    per-partition heaps, no global sort, scale-safe."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z0-9]+)"), 1)).alias(
            "term"
        )
    )
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


ORACLE_TOP_TERMS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
)
SELECT term, count(*) AS n FROM toks GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


def q_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (linear interpolation — identical
    definition to DuckDB quantile_cont). Exact percentile buffers each
    group's values: fine for bounded group count x bounded rows/group;
    the 100 TB path swaps in approx_percentile (t-digest, mergeable
    partial aggs) when groups get huge — same query shape."""
    o = t(spark, sf_dir, "orders")
    pcts = [0.25, 0.50, 0.75]
    # ONE percentile buffer evaluating all three quantiles: the per-group
    # value buffer is built and sorted once instead of once per quantile
    # (3 separate aggregates measured ~1.7x slower at sf0.1).
    ps = F.percentile(
        "o_totalprice", F.array(*[F.lit(p) for p in pcts])
    ).alias("_ps")
    return (
        o.groupBy("o_orderpriority")
        .agg(ps)
        .select(
            "o_orderpriority",
            *[
                F.round(F.col("_ps")[i], 4).alias(f"p{int(p * 100)}")
                for i, p in enumerate(pcts)
            ],
        )
    )


ORACLE_PERCENTILE_PRICES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
"""


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartiles of customer balance WITHIN market segment.
    The window partitions by c_mktsegment (parallel across segments)
    rather than a global ORDER BY — a global ntile serializes the
    whole table through one partition at 100 TB. Tie-break on
    c_custkey makes the frame order total, so results are
    deterministic across engines."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    q = c.select("c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("quartile"))
    return q.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


ORACLE_NTILE_QUARTILES = """
WITH q AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT c_mktsegment, quartile, count(*) AS n,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 4) AS avg_bal
FROM q GROUP BY 1, 2
"""


def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) — written as SQL so Catalyst's decorrelation rewrites it
    into an aggregate + join instead of a per-row re-execution
    (SURVEY §4: 'subquery decorrelation comes free'). The p_brand
    filter prunes the part side to ~1/25 before the join; AQE turns
    the pruned side into a broadcast at runtime."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
        """
    )


ORACLE_SMALL_ORDER_REVENUE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)
"""


def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders in a quarter having
    at least one line item shipped more than 60 days after the order
    date, counted by priority. Written as SQL so Catalyst decorrelates
    the EXISTS into a left-semi join (no per-row subquery execution);
    the o_orderdate range predicate pushes to the orders scan."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        """
    )


ORACLE_LATE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1995-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (average positive
    balance) + correlated NOT EXISTS (customers with no orders),
    aggregated by market segment. Catalyst plans the scalar subquery
    as a one-row broadcast and the NOT EXISTS as a left-anti join —
    both decorrelated, no nested-loop re-execution."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        """
    )


ORACLE_IDLE_RICH_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based statistics — the 100 TB substitute for exact
    distincts, built on PORTABLE sketches so the estimates themselves
    are oracle-verifiable:

    - distinct counts: KMV (K-minimum-values, operators/scale.py
      ``kmv_distinct``) — a mergeable fixed-size sketch whose
      estimate (K-1)*2^32/h_(K) any SQL engine reproduces bit-for-bit
      from the shared Knuth hash.
    - percentiles: explicit order statistics (the ceil(q*n)-th value,
      percentile_disc semantics) via integer rank arithmetic — no
      interpolation, so the selected value is byte-identical across
      engines. One sort shuffle per group-partitioned window; at
      100 TB swap in the KLL/t-digest mergeable sketch
      (``sketch_stats_native``) when a rank error of eps*n is
      acceptable.

    The native HLL++/percentile_approx variant — engine-internal
    encodings, one map-side-combined pass, no cross-engine oracle —
    is registered as ``sketch_stats_native``; error bounds for both
    are asserted in tests/test_scale.py.

    Plan shape (round-4 re-audit of the flagged 0.91->1.37s
    "regression"): two restructures were built, measured interleaved
    in one session, and REJECTED — (a) a fused single-pass multi-key
    KMV (exploded (kind, hash) pairs sharing one scan + one distinct
    shuffle) serialized stages that the branch form runs in parallel
    and measured ~2x slower end-to-end; (b) a dense_rank-over-raw-rows
    form (map-side WindowGroupLimit, no distinct shuffle — better
    network profile at cluster scale) traded the hash-agg distinct
    for a full map-side sort and measured ~1.4x slower (interleaved:
    ~1.0s vs ~1.4s). The branch-parallel distinct->rank shape is the
    bench-optimal one; in-session it re-times at ~1.0s, so most of
    the recorded 1.37s was driver-VM variance, not plan cost."""
    from nypd_arrest_etl_spark.operators.scale import kmv_distinct

    li = t(spark, sf_dir, "lineitem")
    parts = kmv_distinct(li, "l_partkey", ["l_returnflag"], k=256, est_col="nd_parts_kmv")
    orders = kmv_distinct(li, "l_orderkey", ["l_returnflag"], k=256, est_col="nd_orders_kmv")
    kmv = parts.join(orders, "l_returnflag")

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wg = Window.partitionBy("l_returnflag")
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wg))
    )
    idx50 = F.expr("(n + 1) div 2")  # ceil(0.5 * n), exact integer arithmetic
    idx99 = F.expr("(99 * n + 99) div 100")  # ceil(0.99 * n)
    quants = (
        ranked.filter((F.col("rk") == idx50) | (F.col("rk") == idx99))
        .groupBy("l_returnflag")
        .agg(
            F.max(F.when(F.col("rk") == idx50, F.col("l_extendedprice"))).alias(
                "p50_price"
            ),
            F.max(F.when(F.col("rk") == idx99, F.col("l_extendedprice"))).alias(
                "p99_price"
            ),
        )
    )
    return kmv.join(quants, "l_returnflag")


ORACLE_SKETCH_STATS = """
WITH hp AS (SELECT DISTINCT l_returnflag, (l_partkey * 2654435761) % 4294967296 AS h
            FROM lineitem WHERE l_partkey IS NOT NULL),
rp AS (SELECT l_returnflag, h,
              row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
       FROM hp),
kp AS (SELECT l_returnflag, count(*) AS m,
              max(CASE WHEN rk = 256 THEN h END) AS kth
       FROM rp WHERE rk <= 256 GROUP BY l_returnflag),
ep AS (SELECT l_returnflag,
              CASE WHEN m < 256 THEN m::DOUBLE
                   ELSE round(1095216660480.0 / kth, 2) END AS nd_parts_kmv
       FROM kp),
ho AS (SELECT DISTINCT l_returnflag, (l_orderkey * 2654435761) % 4294967296 AS h
       FROM lineitem WHERE l_orderkey IS NOT NULL),
ro AS (SELECT l_returnflag, h,
              row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
       FROM ho),
ko AS (SELECT l_returnflag, count(*) AS m,
              max(CASE WHEN rk = 256 THEN h END) AS kth
       FROM ro WHERE rk <= 256 GROUP BY l_returnflag),
eo AS (SELECT l_returnflag,
              CASE WHEN m < 256 THEN m::DOUBLE
                   ELSE round(1095216660480.0 / kth, 2) END AS nd_orders_kmv
       FROM ko),
q AS (SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
qq AS (SELECT l_returnflag,
              max(CASE WHEN rk = (n + 1) // 2 THEN l_extendedprice END) AS p50_price,
              max(CASE WHEN rk = (99 * n + 99) // 100 THEN l_extendedprice END) AS p99_price
       FROM q GROUP BY l_returnflag)
SELECT ep.l_returnflag, nd_parts_kmv, nd_orders_kmv, p50_price, p99_price
FROM ep JOIN eo ON ep.l_returnflag = eo.l_returnflag
        JOIN qq ON ep.l_returnflag = qq.l_returnflag
"""


def q_sketch_stats_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native sketches: ``approx_count_distinct`` (HLL++) and
    ``percentile_approx`` (KLL-style) are MERGEABLE partial
    aggregates: each partition builds a fixed-size sketch, the shuffle
    moves one sketch per group per partition (not the key stream), and
    merge is associative — so the plan is one map-side-combined pass
    regardless of key cardinality, where exact countDistinct must
    expand to a two-phase distinct shuffle. Sketch register encodings
    are engine-specific, so this is a rows-only entry; error bounds vs
    the exact answers are asserted in tests/test_scale.py. The
    oracle-checkable portable variant is ``sketch_stats``."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("nd_parts_approx"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("nd_orders_approx"),
        F.round(
            F.percentile_approx("l_extendedprice", 0.5, 10_000), 2
        ).alias("p50_price_approx"),
        F.round(
            F.percentile_approx("l_extendedprice", 0.99, 10_000), 2
        ).alias("p99_price_approx"),
    )


# ---------------------------------------------------------------------------
# Scale-hardening operators under the oracle gate (operators/scale.py):
# a salted join and a bloom-pruned join must produce byte-identical
# results to the plain joins DuckDB runs — the rewrites only move
# work, never change semantics.
# ---------------------------------------------------------------------------


def q_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x orders revenue by priority THROUGH salted_join: the
    skewed side's keys spread over 4 salt buckets before the shuffle
    (the fix for hot keys AQE's SMJ-only skew split can't reach).
    Oracle is the plain join — salting must be invisible in results."""
    from nypd_arrest_etl_spark.operators.scale import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    j = salted_join(li, o, ["okey"], "inner", salt_buckets=4)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


ORACLE_SALTED_REVENUE = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-size parts x lineitem THROUGH bloom_prune: the fact scan
    is pre-filtered by a 1 MiB bloom bitmap built over the selective
    dim (cross-stage semi-join pruning; no false negatives, so the
    join after pruning equals the plain join the oracle runs)."""
    from nypd_arrest_etl_spark.operators.scale import bloom_prune

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    dim = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    pruned = bloom_prune(li, dim, "l_partkey", "p_partkey", expected_items=100_000)
    j = pruned.join(dim, pruned.l_partkey == dim.p_partkey)
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


ORACLE_BLOOM_PRUNED = """
SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 5
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# TPC-H join/subquery shapes adapted to the available columns
# (no partsupp / l_commitdate / l_shipmode / p_container in the fixtures)
# ---------------------------------------------------------------------------


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.

    The nation dim joins the plan TWICE (supplier side and customer
    side) — both broadcast, so the only shuffles are the two fact-fact
    equi-joins (lineitem-orders on orderkey, +customer on custkey) and
    the final 3-key agg. The disjunctive nation-pair predicate sits
    above the joins; Catalyst still pushes each branch's IsNotNull and
    the l_shipdate range down to the parquet scans."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue inside
    one region, by order year. Six-table join; every dim broadcasts,
    the two fact joins shuffle on their keys; the share is a
    conditional-sum / sum over the SAME grouped pass (no second scan
    or self-join — the classic sum(CASE)/sum rewrite)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n_c = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_s = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = t(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


ORACLE_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY o_year
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report for customers who returned
    items in one quarter. The o_orderdate range prunes the orders scan,
    l_returnflag prunes lineitem; customer/nation broadcast; top-20 by
    revenue plans as TakeOrderedAndProject (no global sort)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_RETURNED_ITEMS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode absent — keyed by ship year):
    urgent-vs-other line counts via conditional aggregation. One
    orderkey shuffle join + one single-key agg; the CASE branches are
    whole-stage-codegen'd, not separate passes."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_PRIORITY_LINES = """
SELECT year(l_shipdate) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ship_year
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-part revenue share for one month. The
    tight l_shipdate range is pushed to the parquet scan (row-group
    skip at scale); part broadcasts; single ungrouped agg — the whole
    query is one map stage plus one 1-row reduce."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("promo_pct")
        )
    )


ORACLE_PROMO_REVENUE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    suppliers per (brand, type, size) excluding a NOT IN supplier
    denylist. The denylist subquery is null-free, so NOT IN degrades
    to a plain broadcast anti-join (no null-aware BNLJ); the distinct
    count shuffles once on the 3 grouping keys with partial
    de-duplication map-side."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 36)
    )
    deny = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%9"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(deny), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 36)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%9')
GROUP BY p_brand, p_type, p_size
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold (HAVING-IN subquery). The subquery and the
    outer query aggregate the SAME lineitem pass — implemented as one
    orderkey agg reused as a semi-filter, so lineitem is scanned once
    for the filter and once for the join (Catalyst reuses the
    exchange when shapes align); top-100 via TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


ORACLE_LARGE_ORDERS = """
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice, round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
HAVING sum(l_quantity) > 200
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three disjunctive brand/size/
    quantity predicate branches. The join key (partkey) is shared by
    all branches, so this stays ONE broadcast join with the OR
    evaluated as a residual — not three scans unioned. Catalyst
    extracts the common l_quantity/p_size bounds for scan pruning."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(b).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (returnflag stands in for the missing
    commit/receipt dates): suppliers who were the ONLY supplier with
    returned lines on multi-supplier finalized orders.

    The classic form is a correlated EXISTS plus a correlated NOT
    EXISTS against the same fact table — three lineitem scans. Here
    lineitem is scanned ONCE (round-4; the round-3 shape still paid a
    second scan for the returning-lines probe): aggregate to one row
    per (order, supplier) carrying its returning-line count, then an
    order-partitioned window derives both correlations from that
    compact frame — EXISTS(other supplier) == n_supp >= 2, NOT
    EXISTS(other returning supplier) == n_ret_supp == 1 given the
    outer supplier itself returns — and numwait is the sum of the
    carried line counts, so the raw lines are never re-read. The
    window's exchange keys the (order, supplier) frame by order, which
    the orders semi-join then reuses. Decorrelation Catalyst cannot do
    on its own at this shape."""
    li = t(spark, sf_dir, "lineitem")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", True)).alias("n_ret_lines")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_ret_supp", F.count(F.when(F.col("n_ret_lines") > 0, True)).over(w)
        )
        .filter(
            (F.col("n_ret_lines") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_ret_supp") == 1)
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        flagged.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_ret_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


ORACLE_SOLE_RETURNING_SUPPLIER = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. All three predicates
    (shipdate range, discount band, quantity cap) push to the parquet
    scan as min/max row-group skips; the query is one map stage plus a
    one-row reduce — the cheapest possible plan, and the benchmark's
    floor for scan throughput."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
        )
    )


ORACLE_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where the line's supplier
    and the ordering customer share a nation, within one region and one
    order year. The c_nationkey = s_nationkey equality is a join-level
    filter, not a key — it rides the supplier broadcast join as a
    residual. Two fact shuffles (lineitem-orders, +customer); all dims
    broadcast; single agg on n_name."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp fixture — p_retailprice stands in
    for ps_supplycost): per-nation per-year profit on a part-name
    pattern. The LIKE filter prunes part before its broadcast; profit
    is a pure column expression inside one grouped pass; nation
    broadcasts onto the supplier side."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    # Profit = revenue - cost is cancellation-heavy, and the revenue
    # terms are exact 4-decimal values — double summation noise (a few
    # ulps) can straddle the round-half boundary differently per
    # summation order. Casting each term to DECIMAL(18,4) before the
    # sum makes accumulation EXACT and therefore order-independent:
    # the same answer on 1 partition or 10,000. The final round must
    # ALSO happen in decimal (round THEN cast): rounding after a double
    # cast is engine-divergent at half-way points — Spark's double
    # round goes through the shortest decimal string ("...725" rounds
    # up) while DuckDB rounds the binary value ("...72499999..." rounds
    # down); the sf0.001 compare caught exactly that row.
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    cost = (F.col("p_retailprice") * F.col("l_quantity")).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(F.sum(revenue) - F.sum(cost), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


ORACLE_PRODUCT_TYPE_PROFIT = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  - sum(CAST(p_retailprice * l_quantity AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem stands in for partsupp): parts whose
    shipped value from one nation's suppliers exceeds a fraction of
    that nation's total. Written as SQL: the HAVING's scalar subquery
    plans as a one-row broadcast over the grouped result — Catalyst
    reuses the same shuffle exchange for both aggregations, so the
    fact side is scanned and shuffled once."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
        HAVING sum(l_extendedprice * l_quantity) > (
            SELECT sum(l_extendedprice * l_quantity) * 0.001
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_5')
        """
    )


ORACLE_IMPORTANT_STOCK = """
SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY l_partkey
HAVING sum(l_extendedprice * l_quantity) > (
    SELECT sum(l_extendedprice * l_quantity) * 0.001
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5')
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including
    zero-order customers — the inventory's LEFT OUTER join entry. The
    join condition carries a non-key residual (priority exclusion)
    that must be evaluated AT the join, not as a post-filter (a
    post-filter would drop the NULL rows the outer join exists to
    keep). Two shuffles: custkey join+agg, then the tiny c_count
    re-agg."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue. The revenue relation is built once; the max is an
    ungrouped agg over it broadcast back as a one-row cross join —
    never a driver collect, and ties survive (all max suppliers
    return). Revenue is rounded BEFORE the max compare so both
    engines pick an identical winner set under fp noise."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (lineitem's per-(part,supplier) min unit price
    stands in for ps_supplycost): for each qualifying part, the
    European supplier(s) offering the minimum cost.

    The classic correlated-min subquery is rewritten as a window MIN
    over the region-filtered cost relation — the per-part min and the
    equality filter happen in the SAME shuffle pass on p_partkey,
    scanning the cost relation once, where the correlated form would
    build it twice. Unit cost is rounded before comparison so the
    min-match set is identical across engines."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("supplycost")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


ORACLE_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 4) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu AS (
  SELECT l_partkey, l_suppkey, supplycost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
FROM part JOIN eu ON p_partkey = l_partkey
WHERE p_size = 15 AND p_type = 'LARGE'
  AND supplycost = (SELECT min(supplycost) FROM eu e2 WHERE e2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped a
    meaningful volume of a part-name pattern in one year. The inner
    grouped-HAVING relation feeds a LEFT SEMI join (IN-subquery
    decorrelated by construction); part's LIKE filter prunes before
    broadcast; the semi join's right side is already aggregated so
    its key set is small enough to broadcast at any scale."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


ORACLE_POTENTIAL_PROMOTION = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
ORDER BY s_name
"""


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide lineitem measures to long (measure, value)
    rows, re-aggregated per returnflag. ``df.unpivot`` plans as a
    single Expand over one scan — a 4x row multiplication but zero
    extra scans/joins, and the Expand stays inside the scan stage
    (narrow) so the only shuffle is the final 2-key agg."""
    li = t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )


ORACLE_UNPIVOT_MEASURES = """
SELECT l_returnflag, measure, count(*) AS n,
       round(sum(val), 2) AS total, round(avg(val), 6) AS mean
FROM (
  SELECT l_returnflag, measure, val
  FROM lineitem
  UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax)))
GROUP BY l_returnflag, measure
"""


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (§2g extension the LLM-pipeline
    ops lean on): per-label embedding-norm statistics computed with
    F.transform + F.aggregate — a sequential JVM-side fold per row, no
    Python, no explode (an explode would multiply rows x dim before
    the agg; the fold keeps the row count flat). Both engines fold
    left-to-right over float32-exact doubles, so norms are bit-equal."""
    e = t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    norm = F.sqrt(sq_sum)
    return (
        e.select("label", norm.alias("norm"), F.size("embedding").alias("dim"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.max("dim").alias("dim"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


ORACLE_VECTOR_NORMS = """
WITH norms AS (
  SELECT label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm,
         len(embedding) AS dim
  FROM embeddings)
SELECT label, count(*) AS n_vecs, CAST(max(dim) AS INT) AS dim,
       round(avg(norm), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM norms GROUP BY label
"""


_REVENUE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(revenue, 0.0) AS revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""


def q_monthly_revenue_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) date spine left-joined
    to monthly revenue — gap-filled time series with zero rows for
    empty months, which a plain GROUP BY cannot produce. The recursion
    generates ~80 rows on the driver side of the plan (UnionLoop); the
    heavy side is still one scan + one month-key agg, and the spine
    join broadcasts. Same SQL text runs on both engines (§3.4 SQL
    surface)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_REVENUE_SPINE_SQL)


ORACLE_MONTHLY_REVENUE_SPINE = _REVENUE_SPINE_SQL


def q_nation_accounts_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join shape: per-nation customer vs supplier account
    totals, keeping nations that have only one side. Both inputs are
    already aggregated to nation grain before the join, so the outer
    join moves ~25 rows however large the base tables are — aggregate-
    then-join, never join-then-aggregate, is the outer-join scale rule."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("cust_bal"),
        )
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_supps"),
            F.round(F.sum("s_acctbal"), 2).alias("supp_bal"),
        )
    )
    n = t(spark, sf_dir, "nation")
    return (
        c.join(s, "nationkey", "full_outer")
        .join(F.broadcast(n), F.col("nationkey") == n.n_nationkey)
        .select(
            "n_name",
            F.coalesce("n_custs", F.lit(0)).alias("n_custs"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("n_supps", F.lit(0)).alias("n_supps"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
    )


ORACLE_NATION_ACCOUNTS = """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_custs,
         round(sum(c_acctbal), 2) AS cust_bal
  FROM customer GROUP BY 1),
s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_supps,
         round(sum(s_acctbal), 2) AS supp_bal
  FROM supplier GROUP BY 1)
SELECT n_name,
       coalesce(n_custs, 0) AS n_custs, coalesce(cust_bal, 0.0) AS cust_bal,
       coalesce(n_supps, 0) AS n_supps, coalesce(supp_bal, 0.0) AS supp_bal
FROM c FULL OUTER JOIN s USING (nationkey)
JOIN nation ON nationkey = n_nationkey
"""


def q_trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame analytic window: per-day order revenue with a
    trailing-7-day moving sum/count per priority. rangeBetween on the
    epoch-day ORDER BY value (value-based frame — rows at the same day
    collapse; a ROWS frame would be wrong under duplicates). Daily
    grain is pre-aggregated before the window, so window state is
    bounded by days-per-priority, not raw orders."""
    o = t(spark, sf_dir, "orders")
    daily = (
        o.withColumn("day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")))
        .groupBy("o_orderpriority", "day")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        "day_rev",
        F.round(F.sum("day_rev").over(w), 2).alias("trailing_7d_rev"),
        F.count(F.lit(1)).over(w).alias("trailing_7d_days"),
    )


ORACLE_TRAILING_WEEK_REVENUE = """
WITH daily AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day,
         round(sum(o_totalprice), 2) AS day_rev
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, day, day_rev,
       round(sum(day_rev) OVER w, 2) AS trailing_7d_rev,
       count(*) OVER w AS trailing_7d_days
FROM daily
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


_NULL_SEMANTICS_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       count(value) AS n_nonnull,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(value) - count(*) FILTER (WHERE value IN
           (SELECT value FROM events WHERE event_type = 'click' AND value IS NOT NULL))
         AS n_not_in_clicks
FROM events
GROUP BY event_type
"""


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic showcase: COUNT(*) vs COUNT(col) under
    nulls, explicit null buckets, and NOT-IN-clicks computed the
    scale-safe way. A literal probe-nullable ``NOT IN`` forces the
    planner into a null-aware ExistenceJoin (a BroadcastNestedLoopJoin
    — quadratic); with a non-empty null-free build side it is
    EQUIVALENT to ``count(value) - count(value IN build)`` because a
    NULL probe passes neither branch (UNKNOWN) — and plain IN needs no
    null-aware condition, so Catalyst plans a hash ExistenceJoin.
    Same SQL text runs on both engines (spark.sql surface)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_NULL_SEMANTICS_SQL)


ORACLE_NULL_SEMANTICS = _NULL_SEMANTICS_SQL


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# name -> (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------
# Incremental maintenance: CDC snapshot diff + partial-agg merge
# ---------------------------------------------------------------------------


def q_cdc_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I/U/D changelog between two deterministic snapshots of orders.

    base  = orders minus every 101st key, with o_totalprice floored for
            every 7th key (the "stale" value);
    current = orders minus every 97th key.
    So keys %101==0 (and not %97==0) surface as I, %97==0 as D, and
    %7==0 keys whose price has a fractional part as U. Exercises the
    full-outer co-partitioned diff: one SMJ, no data-dependent branches.
    """
    from nypd_arrest_etl_spark.operators.incremental import snapshot_diff

    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.floor("o_totalprice").cast("double")
        ).otherwise(F.col("o_totalprice")),
    )
    current = o.filter(F.col("o_orderkey") % 97 != 0)
    diff = snapshot_diff(
        base,
        current,
        key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return diff.select(
        "o_orderkey",
        "op",
        F.col("n_changed").cast("long").alias("n_changed"),
        "changed_cols",
    )


ORACLE_CDC_ORDERS_DIFF = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(floor(o_totalprice) AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 0
), cur AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
), j AS (
  SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
         b.o_orderkey IS NOT NULL AS in_base,
         c.o_orderkey IS NOT NULL AS in_cur,
         (b.o_orderstatus   IS DISTINCT FROM c.o_orderstatus)   AS d_status,
         (b.o_totalprice    IS DISTINCT FROM c.o_totalprice)    AS d_price,
         (b.o_orderpriority IS DISTINCT FROM c.o_orderpriority) AS d_prio
  FROM base b FULL OUTER JOIN cur c ON b.o_orderkey = c.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_base THEN 'I' WHEN NOT in_cur THEN 'D' ELSE 'U' END AS op,
       CASE WHEN in_base AND in_cur
            THEN CAST(d_status AS INT) + CAST(d_price AS INT) + CAST(d_prio AS INT)
            ELSE 0 END::BIGINT AS n_changed,
       CASE WHEN in_base AND in_cur
            THEN concat_ws(',',
                 CASE WHEN d_prio THEN 'o_orderpriority' END,
                 CASE WHEN d_status THEN 'o_orderstatus' END,
                 CASE WHEN d_price THEN 'o_totalprice' END)
            ELSE '' END AS changed_cols
FROM j
WHERE NOT in_base OR NOT in_cur
   OR (d_status OR d_price OR d_prio)
"""


def q_incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view refresh without base rescan: per-status order
    stats maintained as (base partials before 1997) + (delta partials
    from 1997 on), merged in O(groups). The merged result must equal
    the full-scan aggregate — which is exactly what the oracle runs,
    so the gate proves the mergeability identity, not just plumbing."""
    from nypd_arrest_etl_spark.operators.incremental import merge_agg_partials

    o = t(spark, sf_dir, "orders")
    cut = F.to_date(F.lit("1997-01-01"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
            F.max("o_totalprice").alias("max_price"),
        )

    base = partial(o.filter(F.col("o_orderdate").cast("date") < cut))
    delta = partial(o.filter(F.col("o_orderdate").cast("date") >= cut))
    merged = merge_agg_partials(
        [base, delta],
        group_cols=["o_orderstatus"],
        count_col="n_orders",
        sum_cols=["revenue"],
        max_cols=["max_price"],
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        F.round("revenue", 2).alias("revenue"),
        F.round("max_price", 2).alias("max_price"),
    )


ORACLE_INCREMENTAL_REVENUE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def q_fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: customers fuzzily matched to suppliers on the
    9-digit name suffix at edit distance <= 1, via positional-mask
    blocking (operators/linkage.py) — no cross join anywhere in the
    plan. The oracle intentionally IS the naive exhaustive
    levenshtein cross join: because every key has the same length, the
    pigeonhole blocking is provably complete for distance 1, and the
    gate verifies that completeness on real data, not just plumbing."""
    from nypd_arrest_etl_spark.operators.linkage import blocked_fuzzy_join

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", F.substring_index("c_name", "#", -1).alias("c_suffix")
    )
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.substring_index("s_name", "#", -1).alias("s_suffix")
    )
    return blocked_fuzzy_join(
        cust,
        supp,
        left_key="c_suffix",
        right_key="s_suffix",
        left_id="c_custkey",
        right_id="s_suppkey",
        max_distance=1,
    ).select(
        "c_custkey",
        "s_suppkey",
        "left_key",
        "right_key",
        F.col("edit_distance").cast("long").alias("edit_distance"),
    )


ORACLE_FUZZY_NAME_MATCHES = """
WITH lc AS (
  SELECT c_custkey, split_part(c_name, '#', 2) AS ck FROM customer
), rs AS (
  SELECT s_suppkey, split_part(s_name, '#', 2) AS sk FROM supplier
)
SELECT c_custkey, s_suppkey,
       ck AS left_key, sk AS right_key,
       CAST(levenshtein(ck, sk) AS BIGINT) AS edit_distance
FROM lc CROSS JOIN rs
WHERE levenshtein(ck, sk) <= 1
"""


RELATIONAL: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, ORACLE_PRICING_SUMMARY),
    "grouped_distinct": (q_grouped_distinct, ORACLE_GROUPED_DISTINCT),
    "revenue_by_nation": (q_revenue_by_nation, ORACLE_REVENUE_BY_NATION),
    "brand_volume": (q_brand_volume, ORACLE_BRAND_VOLUME),
    "semi_anti_join": (q_semi_anti, ORACLE_SEMI_ANTI),
    "top_orders_per_customer": (q_top_orders_per_customer, ORACLE_TOP_ORDERS_PER_CUSTOMER),
    "running_totals": (q_running_totals, ORACLE_RUNNING_TOTALS),
    "rollup_lineitem": (q_rollup, ORACLE_ROLLUP),
    "cube_orders": (q_cube, ORACLE_CUBE),
    "set_ops_yearly": (q_set_ops, ORACLE_SET_OPS),
    "top_customers": (q_top_customers, ORACLE_TOP_CUSTOMERS),
    "events_clean": (q_events_clean, ORACLE_EVENTS_CLEAN),
    "tumbling_hourly": (q_tumbling_hourly, ORACLE_TUMBLING_HOURLY),
    "sliding_daily": (q_sliding_daily, ORACLE_SLIDING_DAILY),
    "sessionize": (q_sessionize, ORACLE_SESSIONIZE),
    "shipping_priority": (q_shipping_priority, ORACLE_SHIPPING_PRIORITY),
    "props_variant_stats": (q_props_variant, ORACLE_PROPS_VARIANT),
    "grouping_sets_sql": (q_grouping_sets, ORACLE_GROUPING_SETS),
    "asof_click_before_purchase": (q_asof_click_before_purchase, ORACLE_ASOF),
    "range_pairs_5min": (q_range_pairs, ORACLE_RANGE_PAIRS),
    "embedding_centroids": (q_embedding_centroids, ORACLE_CENTROIDS),
    "median_price": (q_median_price, ORACLE_MEDIAN_PRICE),
    "arrow_group_stats": (q_arrow_group_stats, ORACLE_ARROW_GROUP_STATS),
    "pivot_status_by_year": (q_pivot_status_by_year, ORACLE_PIVOT_STATUS),
    "top_terms": (q_top_terms, ORACLE_TOP_TERMS),
    "percentile_prices": (q_percentile_prices, ORACLE_PERCENTILE_PRICES),
    "ntile_quartiles": (q_ntile_quartiles, ORACLE_NTILE_QUARTILES),
    "small_order_revenue": (q_small_order_revenue, ORACLE_SMALL_ORDER_REVENUE),
    "late_order_priority": (q_late_order_priority, ORACLE_LATE_ORDER_PRIORITY),
    "idle_rich_customers": (q_idle_rich_customers, ORACLE_IDLE_RICH_CUSTOMERS),
    "sketch_stats": (q_sketch_stats, ORACLE_SKETCH_STATS),
    "sketch_stats_native": (q_sketch_stats_native, None),
    "salted_revenue": (q_salted_revenue, ORACLE_SALTED_REVENUE),
    "bloom_pruned_join": (q_bloom_pruned_join, ORACLE_BLOOM_PRUNED),
    "volume_shipping": (q_volume_shipping, ORACLE_VOLUME_SHIPPING),
    "market_share": (q_market_share, ORACLE_MARKET_SHARE),
    "returned_items": (q_returned_items, ORACLE_RETURNED_ITEMS),
    "priority_lines": (q_priority_lines, ORACLE_PRIORITY_LINES),
    "promo_revenue": (q_promo_revenue, ORACLE_PROMO_REVENUE),
    "supplier_counts": (q_supplier_counts, ORACLE_SUPPLIER_COUNTS),
    "large_orders": (q_large_orders, ORACLE_LARGE_ORDERS),
    "disjunctive_revenue": (q_disjunctive_revenue, ORACLE_DISJUNCTIVE_REVENUE),
    "sole_returning_supplier": (q_sole_returning_supplier, ORACLE_SOLE_RETURNING_SUPPLIER),
    "forecast_revenue": (q_forecast_revenue, ORACLE_FORECAST_REVENUE),
    "local_supplier_volume": (q_local_supplier_volume, ORACLE_LOCAL_SUPPLIER_VOLUME),
    "product_type_profit": (q_product_type_profit, ORACLE_PRODUCT_TYPE_PROFIT),
    "important_stock": (q_important_stock, ORACLE_IMPORTANT_STOCK),
    "customer_distribution": (q_customer_distribution, ORACLE_CUSTOMER_DISTRIBUTION),
    "top_supplier": (q_top_supplier, ORACLE_TOP_SUPPLIER),
    "min_cost_supplier": (q_min_cost_supplier, ORACLE_MIN_COST_SUPPLIER),
    "potential_promotion": (q_potential_promotion, ORACLE_POTENTIAL_PROMOTION),
    "unpivot_measures": (q_unpivot_measures, ORACLE_UNPIVOT_MEASURES),
    "vector_norms": (q_vector_norms, ORACLE_VECTOR_NORMS),
    "monthly_revenue_spine": (q_monthly_revenue_spine, ORACLE_MONTHLY_REVENUE_SPINE),
    "nation_accounts_reconciliation": (
        q_nation_accounts_reconciliation,
        ORACLE_NATION_ACCOUNTS,
    ),
    "trailing_week_revenue": (q_trailing_week_revenue, ORACLE_TRAILING_WEEK_REVENUE),
    "null_semantics": (q_null_semantics, ORACLE_NULL_SEMANTICS),
    "session_window_batch": (q_session_window_batch, ORACLE_SESSION_WINDOW_BATCH),
    "cdc_orders_diff": (q_cdc_orders_diff, ORACLE_CDC_ORDERS_DIFF),
    "incremental_revenue": (q_incremental_revenue, ORACLE_INCREMENTAL_REVENUE),
    "fuzzy_name_matches": (q_fuzzy_name_matches, ORACLE_FUZZY_NAME_MATCHES),
}
