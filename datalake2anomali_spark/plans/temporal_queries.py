"""Driver-registered temporal-operator queries (as-of, range join, rollup).

Oracles: DuckDB's native ``ASOF LEFT JOIN`` for the as-of operator (an
independent implementation of the same semantics — the strongest possible
check), a plain inequality join for the range join, and direct-from-raw
aggregation for the rollup chain (whose Spark side deliberately re-aggregates
finer levels instead; matching results prove the chain is lossless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake2anomali_spark.functions.exact import DSUM_SQL
from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators import temporal

_SCALE = 3


def _typed(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("event_id", "user_id", "ts", "value")
    )


def asof_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's most recent error at or before it."""
    clicks = _typed(spark, sf_dir, "click").drop("value")
    errors = _typed(spark, sf_dir, "error").drop("value")
    joined = temporal.asof_join(clicks, errors, keys=["user_id"], ts_col="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("event_id_r").alias("err_event_id"),
        F.unix_micros(F.col("ts_r")).alias("err_ts_us"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("lag_us"),
    )


ASOF_SQL = """
SELECT l.event_id,
       l.user_id,
       epoch_us(l.ts) AS ts_us,
       r.event_id AS err_event_id,
       epoch_us(r.ts) AS err_ts_us,
       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


#: Tolerance for the bounded as-of query: only errors within the trailing
#: hour of a click count as its "most recent error" (feature-store /
#: trade-quote contract — unbounded lookback joins stale context).
ASOF_TOLERANCE_US = 3600 * 1_000_000


def asof_click_error_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded as-of: each click's most recent error, but only if it is at
    most :data:`ASOF_TOLERANCE_US` old — older matches null out, exactly
    pandas ``merge_asof(tolerance=...)``.  Same one-shuffle union-carry plan
    as the unbounded twin; the bound is a null-out in the final projection.

    Oracle: DuckDB's native ``ASOF LEFT JOIN`` with a residual CASE on the
    matched timestamp — an independent implementation of the same contract.
    """
    clicks = _typed(spark, sf_dir, "click").drop("value")
    errors = _typed(spark, sf_dir, "error").drop("value")
    joined = temporal.asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts", tolerance_us=ASOF_TOLERANCE_US
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("event_id_r").alias("err_event_id"),
        F.unix_micros(F.col("ts_r")).alias("err_ts_us"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("lag_us"),
    )


ASOF_TOLERANCE_SQL = f"""
SELECT l.event_id,
       l.user_id,
       epoch_us(l.ts) AS ts_us,
       CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {ASOF_TOLERANCE_US}
            THEN r.event_id END AS err_event_id,
       CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {ASOF_TOLERANCE_US}
            THEN epoch_us(r.ts) END AS err_ts_us,
       CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {ASOF_TOLERANCE_US}
            THEN epoch_us(l.ts) - epoch_us(r.ts) END AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def asof_click_error_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward and nearest as-of in one row per click
    (``operators/temporal.py: asof_join(direction=…)``): ``forward``
    matches the user's oldest error at-or-after the click, ``nearest``
    the closer of backward/forward with ties to backward — both from the
    same one-shuffle union-and-carry plan as the backward default.

    Oracle: DuckDB's native ``ASOF LEFT JOIN`` run both ways, with the
    nearest choice replayed as a CASE over the two candidates — an
    independent implementation of the same contract.
    """
    clicks = _typed(spark, sf_dir, "click").drop("value")
    errors = _typed(spark, sf_dir, "error").drop("value")
    fwd = temporal.asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts", direction="forward"
    )
    near = temporal.asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts", direction="nearest"
    )
    f = fwd.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("event_id_r").alias("fwd_event_id"),
        F.unix_micros(F.col("ts_r")).alias("fwd_ts_us"),
    )
    n = near.select(
        "event_id",
        F.col("event_id_r").alias("near_event_id"),
        F.unix_micros(F.col("ts_r")).alias("near_ts_us"),
    )
    return f.join(n, "event_id").orderBy("event_id")


ASOF_DIRECTIONS_SQL = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
r AS (SELECT * FROM events WHERE event_type = 'error'),
fwd AS (
  SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
         r.event_id AS fwd_event_id, epoch_us(r.ts) AS fwd_ts_us
  FROM l ASOF LEFT JOIN r
    ON l.user_id = r.user_id AND l.ts <= r.ts
),
bwd AS (
  SELECT l.event_id, r.event_id AS b_id, epoch_us(r.ts) AS b_ts
  FROM l ASOF LEFT JOIN r
    ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT f.event_id, f.user_id, f.ts_us, f.fwd_event_id, f.fwd_ts_us,
       CASE WHEN b.b_ts IS NOT NULL
                  AND (f.fwd_ts_us IS NULL
                       OR f.ts_us - b.b_ts <= f.fwd_ts_us - f.ts_us)
            THEN b.b_id ELSE f.fwd_event_id END AS near_event_id,
       CASE WHEN b.b_ts IS NOT NULL
                  AND (f.fwd_ts_us IS NULL
                       OR f.ts_us - b.b_ts <= f.fwd_ts_us - f.ts_us)
            THEN b.b_ts ELSE f.fwd_ts_us END AS near_ts_us
FROM fwd f JOIN bwd b ON b.event_id = f.event_id
ORDER BY f.event_id
"""


def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing in the 6 hours after each error, counted per error."""
    errors = _typed(spark, sf_dir, "error").select(
        F.col("event_id").alias("err_event_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + 21600 * 1_000_000).alias("end_us"),
    )
    clicks = _typed(spark, sf_dir, "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    pairs = temporal.range_join(clicks, errors, keys=["user_id"], bucket_us=21600 * 1_000_000)
    return pairs.groupBy("err_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min("ts_us").alias("first_click_us"),
    )


RANGE_SQL = """
SELECT r.event_id AS err_event_id,
       COUNT(*) AS n_clicks,
       MIN(epoch_us(l.ts)) AS first_click_us
FROM (SELECT * FROM events WHERE event_type = 'error') r
JOIN (SELECT * FROM events WHERE event_type = 'click') l
  ON l.user_id = r.user_id
 AND epoch_us(l.ts) >= epoch_us(r.ts)
 AND epoch_us(l.ts) <= epoch_us(r.ts) + 21600000000
GROUP BY 1
"""


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day grains in one pass (base agg + GROUPING SETS).

    2 shuffles / 1 scan for any number of grains — the union-of-levels
    formulation recomputed the base aggregate per grain (5 shuffles,
    2 scans for two grains).  The oracle aggregates straight from raw
    events, so a hash match proves the multi-grain pass loses nothing.
    ``temporal.rollup_chain`` remains the persist-per-level variant for
    incremental refresh.
    """
    return temporal.rollup_grains_one_pass(
        load_table(spark, sf_dir, "events"), dims=["event_type"], scale=_SCALE
    )


ROLLUP_SQL = f"""
WITH grains(grain, span) AS (VALUES ('hour', 3600), ('day', 86400))
SELECT CAST(FLOOR(epoch(ts) / g.span) * g.span AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * {10**_SCALE}) AS BIGINT)) AS DOUBLE) / {10**_SCALE} AS value_sum,
       g.grain AS grain
FROM events, grains g
GROUP BY 1, 2, 5
"""


#: Burst-alert knobs: a repeat error from the same user within a trailing
#: 6 hours (sized to the synthetic corpus's event density — 212 alerts at
#: sf0.01; production tunes both).
BURST_N = 2
BURST_WINDOW_US = 21600 * 1_000_000


def burst_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style burst detection: alert rows for every error that is the
    ≥\\ :data:`BURST_N`-th error by the same user within the trailing
    :data:`BURST_WINDOW_US` — the SIEM brute-force/beaconing primitive the
    reference's threat-intel domain feeds (its connector ships indicators;
    this is the detection query a consumer runs over the same bus).

    Operator surface: an event-time RANGE window frame
    (``rangeBetween(-window, 0)`` over unix-µs order) — a count over an
    interval of the ORDER BY value, not a row count, so gaps and ties are
    handled by time, and no self-join materializes error×error pairs.  One
    shuffle on ``user_id``; at 100 TB the frame is evaluated by a single
    sort-scan per user shard with a sliding two-pointer, linear in events.
    """
    from pyspark.sql import Window

    err = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-BURST_WINDOW_US, 0)
    )
    return (
        err.withColumn("n_recent", F.count(F.lit(1)).over(w))
        .filter(F.col("n_recent") >= BURST_N)
        .select("event_id", "user_id", "ts_us", "n_recent")
    )


BURST_SQL = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us, n_recent
FROM (
  SELECT event_id, user_id, ts,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN {BURST_WINDOW_US} PRECEDING AND CURRENT ROW)
           AS n_recent
  FROM events WHERE event_type = 'error'
)
WHERE n_recent >= {BURST_N}
"""


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 6-hour rollup with LOCF per user (operators/temporal.py:
    gap_fill) — every bucket between a user's first and last event exists,
    empty buckets carry the last value sum forward and are flagged."""
    from ..operators.temporal import gap_fill

    return gap_fill(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        bucket_minutes=360,
    )


GAP_FILL_SQL = f"""
WITH agg AS (
  SELECT user_id, epoch_us(ts) // {360 * 60_000_000} AS bucket,
         COUNT(*) AS n_events,
         {DSUM_SQL("value", 2)} AS v_sum
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(bucket) AS b_lo, MAX(bucket) AS b_hi FROM agg GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(b_lo, b_hi)) AS bucket FROM bounds
),
j AS (
  SELECT s.user_id, s.bucket, a.n_events, a.v_sum
  FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.bucket = a.bucket
)
SELECT user_id, bucket,
       COALESCE(n_events, 0) AS n_events,
       last_value(v_sum IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
       (v_sum IS NULL) AS is_gap
FROM j
ORDER BY user_id, bucket
"""

def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals of each user's event_type stream
    (operators/temporal.py: scd2_history) — change detection via lag,
    interval close via lead, deterministic same-timestamp tiebreak."""
    return temporal.scd2_history(load_table(spark, sf_dir, "events"))


SCD2_SQL = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
),
c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS attr, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         AS valid_to_us,
       (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         IS NULL) AS is_current
FROM c
"""

#: Probe instants for the time-travel query: days 5/15/25 of the event
#: window (2024-01-01 epoch 1_704_067_200 s), in microseconds.
TT_PROBES_US = [(1_704_067_200 + d * 86_400) * 1_000_000 for d in (5, 15, 25)]


def time_travel_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension state as of three instants, reconstructed from the SCD2
    history (``operators/temporal.py: state_at_times``): the half-open
    interval filter runs as one map-only higher-order-function pass over
    the history — no join.  Oracle replays the same SCD2 CTE and probes
    with an explicit interval-containment join."""
    from datalake2anomali_spark.operators.temporal import scd2_history, state_at_times

    h = scd2_history(load_table(spark, sf_dir, "events"))
    return state_at_times(h, TT_PROBES_US)


TIME_TRAVEL_SQL = f"""
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
),
c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
h AS (
  SELECT user_id, event_type AS attr, ts_us AS valid_from_us,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS valid_to_us
  FROM c
)
SELECT t.as_of_us, h.user_id, h.attr
FROM (VALUES {", ".join(f"({t})" for t in TT_PROBES_US)}) t(as_of_us)
JOIN h ON h.valid_from_us <= t.as_of_us
      AND (h.valid_to_us IS NULL OR h.valid_to_us > t.as_of_us)
"""


QUERIES = {
    "asof_join_click_error": asof_click_error,
    "time_travel": time_travel_states,
    "asof_join_tolerance": asof_click_error_tolerance,
    "asof_join_directions": asof_click_error_directions,
    "range_join_error_clicks": range_join_error_clicks,
    "hypertable_rollup": hypertable_rollup,
    "burst_alerts": burst_alerts,
    "gap_fill_locf": gap_fill_locf,
    "scd2_history": scd2_user_history,
}

ORACLES = {
    "asof_join_click_error": ASOF_SQL,
    "time_travel": TIME_TRAVEL_SQL,
    "asof_join_tolerance": ASOF_TOLERANCE_SQL,
    "asof_join_directions": ASOF_DIRECTIONS_SQL,
    "range_join_error_clicks": RANGE_SQL,
    "hypertable_rollup": ROLLUP_SQL,
    "burst_alerts": BURST_SQL,
    "gap_fill_locf": GAP_FILL_SQL,
    "scd2_history": SCD2_SQL,
}


# -- skew-mitigation demo (operators/skew.py) --------------------------------


def salted_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join + salted agg over a deliberately low-cardinality key.

    lineitem⋈orders on orderkey (salted 8-way), then revenue stats per
    o_orderpriority (5 distinct values — the hot-key shape).  The oracle is
    the plain unsalted SQL: identical results prove salting is purely a
    physical rewrite.
    """
    from datalake2anomali_spark.functions.exact import dsum
    from datalake2anomali_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = skew.salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        keys=["o_orderkey"],
        salt_from=["o_orderkey", "l_linenumber"],
        n_salts=8,
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cents = F.round(revenue * 100).cast("long")
    out = skew.salted_agg(
        joined.withColumn("rev_cents", cents),
        keys=["o_orderpriority"],
        partials={
            "n_items": (F.count(F.lit(1)), F.sum("n_items")),
            "rev_cents": (F.sum("rev_cents"), F.sum("rev_cents")),
            "max_price": (F.max("l_extendedprice"), F.max("max_price")),
        },
        salt_from=["o_orderkey", "l_linenumber"],
        n_salts=8,
    )
    return out.select(
        "o_orderpriority",
        "n_items",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        "max_price",
    )


SALTED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100
         AS revenue,
       MAX(l_extendedprice) AS max_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

QUERIES["salted_skew_stats"] = salted_priority_stats
ORACLES["salted_skew_stats"] = SALTED_SQL
