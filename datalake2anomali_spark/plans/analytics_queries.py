"""Driver-registered product-analytics queries (funnel, cohort, EWMA).

Each oracle is an *independent* DuckDB formulation of the same contract:
the funnel oracle uses the naive chain-of-joins definition (the Spark side
is the one-shuffle windowed rewrite — a hash match proves the rewrite), the
cohort oracle the same epoch-week integer arithmetic over a window min, and
the EWMA oracle DuckDB's own ``list``-window + ``list_reduce`` fold of the
identical scaled-integer recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators import analytics

#: Ordered conversion funnel over the synthetic product-event stream.
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view→click→purchase per user
    (``operators/analytics.py: funnel_steps``) — one shuffle on user_id via
    running conditional window minima; the oracle is the k-join textbook
    definition, so a hash match proves the single-pass rewrite."""
    return analytics.funnel_steps(
        load_table(spark, sf_dir, "events"), steps=FUNNEL_STEPS
    )


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY 1
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY 1
)
SELECT u.user_id AS entity,
       epoch_us(t1.t) AS step1_us,
       epoch_us(t2.t) AS step2_us,
       epoch_us(t3.t) AS step3_us,
       CAST(CASE WHEN t1.t IS NULL THEN 0 ELSE 1 END
          + CASE WHEN t2.t IS NULL THEN 0 ELSE 1 END
          + CASE WHEN t3.t IS NULL THEN 0 ELSE 1 END AS INT) AS steps_completed
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle
    (``operators/analytics.py: cohort_retention``): cohort = epoch-week of
    each user's first event, cells = exact distinct actives per
    (cohort, offset)."""
    return analytics.cohort_retention(load_table(spark, sf_dir, "events"))


COHORT_SQL = f"""
WITH wk AS (
  SELECT user_id, epoch_us(ts) // {analytics.WEEK_US} AS w FROM events
), coh AS (
  SELECT user_id, w, MIN(w) OVER (PARTITION BY user_id) AS cohort_week FROM wk
)
SELECT cohort_week,
       w - cohort_week AS week_offset,
       COUNT(DISTINCT user_id) AS active_entities
FROM coh
GROUP BY 1, 2
"""


def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event decayed user-value feature
    (``operators/analytics.py: ewma_features``): α=1/2 dyadic EWMA over the
    last 10 events, scaled-integer fold — bit-exact against DuckDB's
    ``list_reduce`` of the same recurrence."""
    return analytics.ewma_features(load_table(spark, sf_dir, "events"))


EWMA_SQL = """
SELECT event_id,
       user_id AS entity,
       epoch_us(ts) AS ts_us,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT), l),
         (acc, x) -> x + (acc >> 1)
       ) AS ewma_scaled
FROM (
  SELECT event_id, user_id, ts,
         list(CAST(ROUND(value * 1000) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
         ) AS l
  FROM events
) t
"""


QUERIES = {
    "funnel_analysis": funnel_view_click_purchase,
    "cohort_retention": cohort_retention_weekly,
    "ewma_features": ewma_user_values,
}

ORACLES = {
    "funnel_analysis": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "ewma_features": EWMA_SQL,
}
