"""Event-table analytics: retention cohorts and sequential funnels.

The product-analytics queries an events table exists to answer, built on
the same `events` stream table the windowing queries use. Both are
two-phase aggregations over (user, time) — at 100 TB the heavy first
phase keys on user_id (high cardinality, even distribution) and the
second phase on the tiny cohort/step grid, the partition-friendly shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)) AS INT) AS week_offset
      FROM events e JOIN firsts f USING (user_id))
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
           count(*) AS n_active_users
    FROM activity
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("events", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention: users bucketed by first-activity week, counted
    in each subsequent week they return (ISO Monday weeks in both
    engines)."""
    (ev,) = load(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_week",
                ((F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                  - F.unix_timestamp(F.col("cohort_week")))
                 / (7 * 86400)).cast("int").alias("week_offset"))
        .distinct()
    )
    return (
        activity.groupBy(F.col("cohort_week").cast("date").alias("cohort_week"),
                         "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "event_funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS did_signup,
      CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
               THEN 1 ELSE 0 END) AS BIGINT) AS signup_then_view,
      CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                AND t_purchase > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM steps
    """,
    tags=("events", "funnel", "conversion"),
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup -> view -> purchase funnel: per-user first timestamp of
    each step (one conditional-min aggregation), then ordered-sequence
    counts. NULL comparisons are three-valued in both engines, so a
    missing step never counts as ordered."""
    (ev,) = load(spark, sf_dir, "events")
    t = {s: F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
         for s in ("signup", "view", "purchase")}
    steps = ev.groupBy("user_id").agg(*t.values())
    sig = F.col("t_signup").isNotNull()
    s_v = sig & (F.col("t_view") > F.col("t_signup"))
    s_v_p = s_v & (F.col("t_purchase") > F.col("t_view"))
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(sig.cast("long")).alias("did_signup"),
        F.sum(s_v.cast("long")).alias("signup_then_view"),
        F.sum(s_v_p.cast("long")).alias("full_funnel"),
    )
