"""Event/entity analytics query declarations (funnel, retention,
SCD2) with DuckDB oracle twins.

Same contract as plans.queries: every computed column aliased
identically on both sides; rounding collapses cross-engine float
noise. The events table goes through events_with_ts (plans.queries)
so both physical ts layouts land on identical microsecond timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nypd_arrest_etl_spark.operators import analytics as A
from nypd_arrest_etl_spark.plans.queries import events_with_ts, t


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase first-touch funnel. One user-keyed
    shuffle total (chained window minima share the exchange)."""
    ev = events_with_ts(spark, sf_dir)
    return A.funnel(ev, ["view", "click", "purchase"])


ORACLE_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, event_type, ts FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
u0 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
       FROM e GROUP BY user_id),
u1 AS (SELECT u0.user_id, t0,
              min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END) AS t1
       FROM u0 LEFT JOIN e ON e.user_id = u0.user_id GROUP BY u0.user_id, t0),
u2 AS (SELECT u1.user_id, t0, t1,
              min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END) AS t2
       FROM u1 LEFT JOIN e ON e.user_id = u1.user_id GROUP BY u1.user_id, t0, t1),
c AS (SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM u2)
SELECT CAST(s.step AS INT) AS step, s.step_name, s.n_users,
       round(CASE WHEN n0 > 0 THEN s.n_users * 1.0 / n0 ELSE 0 END, 6)
           AS conversion_rate
FROM c, LATERAL (
  SELECT 1 AS step, 'view' AS step_name, n0 AS n_users
  UNION ALL SELECT 2, 'click', n1
  UNION ALL SELECT 3, 'purchase', n2
) s
ORDER BY step
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events (8-week horizon)."""
    ev = events_with_ts(spark, sf_dir)
    return A.retention_cohorts(ev, max_weeks=8)


ORACLE_RETENTION_COHORTS = """
WITH f AS (SELECT user_id, date_trunc('week', ts) AS wk,
                  min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cwk
           FROM events),
a AS (SELECT DISTINCT cwk,
             CAST(date_diff('day', cwk, wk) / 7 AS INT) AS week_offset, user_id
      FROM f WHERE date_diff('day', cwk, wk) / 7 <= 8),
c AS (SELECT cwk, week_offset, count(*) AS n_active FROM a GROUP BY 1, 2),
b AS (SELECT cwk, n_active AS n_cohort FROM c WHERE week_offset = 0)
SELECT CAST(c.cwk AS DATE) AS cohort_week, week_offset, n_active,
       round(n_active * 1.0 / n_cohort, 6) AS retention_rate
FROM c JOIN b USING (cwk)
ORDER BY cohort_week, week_offset
"""


def q_status_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each customer's order-status stream: collapse
    consecutive equal statuses into validity intervals."""
    orders = t(spark, sf_dir, "orders")
    return A.scd2_history(
        orders,
        key_col="o_custkey",
        attr_col="o_orderstatus",
        time_col="o_orderdate",
        seq_col="o_orderkey",
    )


ORACLE_STATUS_HISTORY_SCD2 = """
WITH s AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                  row_number() OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn,
                  lag(o_orderstatus) OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey FROM s
       WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev)
SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
       lead(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
       lead(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
           AS is_current
FROM ch
"""


def q_outlier_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier profile: median/MAD guardrail
    stats with |v - med| > 3.5 * MAD flagging."""
    ev = events_with_ts(spark, sf_dir)
    return A.mad_outliers(ev, group_col="event_type", value_col="value", k=3.5)


ORACLE_OUTLIER_VALUES = """
WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY 1),
dev AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
        FROM events e JOIN med m USING (event_type)),
mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY 1)
SELECT d.event_type,
       count(d.value) AS n,
       round(any_value(d.med), 6) AS med,
       round(any_value(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.absdev > 3.5 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       round(sum(CASE WHEN d.absdev > 3.5 * m.mad THEN 1 ELSE 0 END) * 1.0
             / count(d.value), 6) AS outlier_rate
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams (one user-keyed shuffle; O(types²) output)."""
    ev = events_with_ts(spark, sf_dir)
    return A.event_transitions(ev)


ORACLE_EVENT_TRANSITIONS = """
WITH p AS (SELECT user_id, event_type,
                  lag(event_type) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM p WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per observed day, via the
    contribution-explode rewrite (no DISTINCT-over-RANGE in any
    engine)."""
    ev = events_with_ts(spark, sf_dir)
    return A.rolling_distinct_users(ev, window_days=7)


ORACLE_ROLLING_DISTINCT_USERS = """
WITH pairs AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
contrib AS (
  SELECT u, CAST(gs AS DATE) AS day
  FROM pairs, LATERAL (
    SELECT unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS gs
  ) t
),
observed AS (SELECT DISTINCT d AS day FROM pairs)
SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS n_users
FROM contrib JOIN observed USING (day)
GROUP BY day ORDER BY day
"""


ANALYTICS: dict[str, tuple] = {
    "events_funnel": (q_events_funnel, ORACLE_EVENTS_FUNNEL),
    "retention_cohorts": (q_retention_cohorts, ORACLE_RETENTION_COHORTS),
    "status_history_scd2": (q_status_history_scd2, ORACLE_STATUS_HISTORY_SCD2),
    "outlier_values": (q_outlier_values, ORACLE_OUTLIER_VALUES),
    "event_transitions": (q_event_transitions, ORACLE_EVENT_TRANSITIONS),
    "rolling_distinct_users": (q_rolling_distinct_users, ORACLE_ROLLING_DISTINCT_USERS),
}


def q_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample of event values with linear
    interpolation of empty buckets (endpoints extend flat)."""
    from nypd_arrest_etl_spark.operators.temporal import resample_interpolate

    ev = events_with_ts(spark, sf_dir)
    return resample_interpolate(ev, every_seconds=3600, value_scale=2)


ORACLE_RESAMPLE_HOURLY = """
WITH m AS (SELECT user_id AS k,
                  CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS b,
                  sum(CAST(round(value * 100) AS BIGINT)) / (100.0 * count(value)) AS v
           FROM events GROUP BY 1, 2),
span AS (SELECT k, min(b) AS b0, max(b) AS b1 FROM m GROUP BY k),
grid AS (SELECT k, CAST(gs AS BIGINT) AS b
         FROM span, LATERAL (SELECT unnest(generate_series(b0, b1, 3600)) AS gs) t),
g AS (SELECT grid.k, grid.b, m.v
      FROM grid LEFT JOIN m ON grid.k = m.k AND grid.b = m.b),
f AS (SELECT k, b, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM g)
SELECT k AS user_id, b AS bucket_sec,
       floor((CASE WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv) * (b - pb) / (nb - pb) END) * 1000000 + 0.5)
           / 1000000 AS value,
       v IS NOT NULL AS is_observed
FROM f
"""

ANALYTICS["resample_hourly"] = (q_resample_hourly, ORACLE_RESAMPLE_HOURLY)
