"""Windowed aggregations over the ``events`` stream table.

Each transform is written against a plain ``DataFrame`` so the *same function*
serves batch (oracle-checked against DuckDB) and streaming (wired up in
:mod:`datalake2anomali_spark.streaming.incremental`).  This is the Spark-first
restatement of the reference's schedule-tick batching (reference
``src/core.py:41-48``): instead of "one batch per cron tick", time itself is
the grouping key via ``F.window`` / ``F.session_window``.

Scale notes (100 TB): a tumbling/sliding window agg is a single hash
aggregation whose key is ``(window, dims)`` — partial aggregation happens
map-side, so the shuffle carries one row per (window, dim) per input
partition, not per event.  Session windows shuffle once on the session key
(``user_id``) then sort-merge locally per key; skewed users are handled by
AQE skew-join/agg splitting (enabled in session.py).  Window starts are
emitted as epoch seconds (BIGINT) so oracle value-hashes are type-stable
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake2anomali_spark.functions.exact import DSUM_SQL, dsum
from datalake2anomali_spark.io.tables import load_table

# value snapped to 3 decimals: events.value is a synthetic double metric
_SCALE = 3


def _wstart(minutes: int) -> Column:
    """Epoch-second start of the tumbling window containing ``ts``."""
    return F.unix_timestamp(F.window("ts", f"{minutes} minutes").getField("start"))


# -- tumbling ---------------------------------------------------------------


def tumbling_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Per-(window, event_type) count + exact value sum over tumbling windows.

    Works unchanged on a streaming DataFrame (add ``withWatermark`` upstream).
    """
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", _SCALE).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def tumbling_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), minutes=5)


TUMBLING_SQL = f"""
SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS w_start,
       event_type,
       COUNT(*) AS n_events,
       {DSUM_SQL('value', _SCALE)} AS value_sum
FROM events
GROUP BY 1, 2
"""


# -- sliding (hopping) ------------------------------------------------------


def sliding_stats(events: DataFrame, length_minutes: int = 10, slide_minutes: int = 5) -> DataFrame:
    """Overlapping-window stats: each event lands in ``length/slide`` windows.

    Spark implements the fan-out with an internal generator (explode of the
    window list) *before* the hash agg — rows expand ``length/slide``-fold on
    the map side but partial aggregation collapses them again before the
    shuffle, so the exchanged volume stays one row per (window, type).
    """
    return (
        events.groupBy(
            F.window("ts", f"{length_minutes} minutes", f"{slide_minutes} minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", _SCALE).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_stats(load_table(spark, sf_dir, "events"))


# DuckDB has no sliding windows: fan each row out to the k = length/slide
# candidate window starts (bucket-by-slide minus k slides), keep the ones that
# still cover the row — exactly Spark's internal expansion.
SLIDING_SQL = f"""
WITH fanout AS (
  SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) - k.k * 300 AS w_start,
         event_type, value, ts
  FROM events, (SELECT unnest(range(0, 2)) AS k) k
)
SELECT w_start, event_type, COUNT(*) AS n_events,
       {DSUM_SQL('value', _SCALE)} AS value_sum
FROM fanout
WHERE epoch(ts) < w_start + 600
GROUP BY 1, 2
"""


# -- session windows --------------------------------------------------------


def session_window_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap-based sessions via the native ``session_window`` operator.

    The declarative twin of ``plans.breadth.sessionize`` (lag + cumsum): one
    shuffle on ``user_id``, local sort, linear merge of adjacent windows.  On
    a stream this is the watermark-evicted session operator; in batch the same
    plan runs with an ordinary aggregate.  Session end = last event + gap
    (Spark semantics), so ``duration_s`` measures first→last event instead.
    """
    gap = f"{gap_minutes} minutes"
    return (
        events.groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            dsum("value", _SCALE).alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            "n_events",
            (F.unix_micros(F.col("last_ts")) - F.unix_micros(F.col("first_ts"))).alias(
                "duration_us"
            ),
            "value_sum",
        )
    )


def session_window_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_stats(load_table(spark, sf_dir, "events"))


# -- merged driver-gate query ------------------------------------------------


def batch_windows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding + session window aggs as ONE tagged union — a single driver
    row certifies both operators (gate-footprint consolidation, VERDICT r3
    #5).  The tumbling twin is certified via ``stream_tumbling_counts``,
    which drives the same :func:`tumbling_counts` against the same oracle.

    Plan shape: two independent aggregations over one events scan unioned —
    no extra shuffle vs running them separately (Spark unions are free), and
    each branch keeps its own map-side partial aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    sl = sliding_stats(ev).select(
        F.lit("sliding").alias("op"),
        F.col("w_start").alias("k_time"),
        F.col("event_type").alias("k_dim"),
        "n_events",
        "value_sum",
        F.lit(None).cast("long").alias("duration_us"),
    )
    se = session_window_stats(ev).select(
        F.lit("session").alias("op"),
        F.col("sess_start").alias("k_time"),
        F.col("user_id").cast("string").alias("k_dim"),
        "n_events",
        "value_sum",
        "duration_us",
    )
    return sl.unionByName(se)


# Gaps-and-islands oracle.  Spark's session_window merges an event into the
# current session iff ts < prev_end (= prev_ts + gap), so a gap of exactly
# `gap` starts a NEW session → the SQL marks new sessions with `>=`.
SESSION_WINDOW_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
  FROM marked
)
SELECT user_id,
       CAST(epoch(time_bucket(INTERVAL '1 second', MIN(ts))) AS BIGINT) AS sess_start,
       COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       {DSUM_SQL('value', _SCALE)} AS value_sum
FROM sessions
GROUP BY user_id, sess_idx
"""


BATCH_WINDOWS_SQL = f"""
SELECT 'sliding' AS op, w_start AS k_time, event_type AS k_dim,
       n_events, value_sum, CAST(NULL AS BIGINT) AS duration_us
FROM ({SLIDING_SQL})
UNION ALL
SELECT 'session' AS op, sess_start AS k_time, CAST(user_id AS VARCHAR) AS k_dim,
       n_events, value_sum, duration_us
FROM ({SESSION_WINDOW_SQL})
"""
