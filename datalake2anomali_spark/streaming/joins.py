"""Stream–stream joins: watermarked interval join over the event stream.

The last Structured Streaming operator class the engine exposes: joining
two live streams (here clicks × errors from the same event bus) on an
equi-key plus an event-time interval.  Batch twin:
``operators/temporal.py: range_join`` — same semantics, bucketed equi-join
instead of join state.

Scale design: Spark keeps BOTH sides in the state store, sharded by the
equi-key (user_id), and the watermark + the time-interval condition bound
how long each row is retained — a click can only match errors in the
preceding ``horizon``, so once the watermark passes ``click_ts − horizon``
the buffered error rows age out (and symmetrically for clicks).  State size
is O(events per watermark horizon per key shard), independent of stream
lifetime; without the interval condition on BOTH sides' event time the
state would grow forever, which is why :func:`stream_click_error_join`
hardcodes the two-sided bound rather than accepting a bare equi-join.

The reference has no streaming join (its pipeline is a stateless per-tick
pull, ``/root/reference/src/core.py:41-48``); this belongs to the
driver-mandated streaming extension surface (SURVEY.md §2.9/§2.11).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import read_events_stream, run_to_completion

#: Match window: clicks within 6 hours after an error (same as the batch
#: range-join query, temporal_queries.py).
HORIZON_US = 21600 * 1_000_000


def interval_join(
    clicks: DataFrame,
    errors: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked inner interval join: click × error pairs where the click
    lands within :data:`HORIZON_US` after the error, same user.

    Both inputs must be streaming frames carrying ``(user_id,
    click_ts/click_event_id)`` and ``(user_id, err_ts/err_event_id)``.
    Output: one row per matching pair with the click→error lag.
    """
    c = clicks.withWatermark("click_ts", watermark)
    e = errors.withWatermark("err_ts", watermark)
    joined = c.join(
        e,
        F.expr(
            "user_id = err_user_id AND "
            "click_ts >= err_ts AND "
            "click_ts <= err_ts + INTERVAL 6 HOURS"
        ),
        "inner",
    )
    return joined.select(
        "err_event_id",
        "click_event_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("err_ts")).alias("lag_us"),
    )


def stream_click_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming interval join over the events parquet.

    Two streaming scans of the same bus (a stream self-join, which Spark
    supports for inner joins), split by event_type; single availableNow
    batch, so the watermark drops nothing and the result is
    oracle-comparable to the batch inequality join.  Multi-batch state
    aging is the watermark mechanics already pinned by
    ``tests/test_streaming.py``'s late-data cases.
    """
    path = os.path.join(sf_dir, "events.parquet")
    clicks = (
        read_events_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    errors = (
        read_events_stream(spark, path)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_event_id"),
            F.col("user_id").alias("err_user_id"),
            F.col("ts").alias("err_ts"),
        )
    )
    out = run_to_completion(
        interval_join(clicks, errors),
        output_mode="append",
        state_partitions=2,  # gate-corpus sizing; scale with keys/executors
    )
    return out


STREAM_INTERVAL_JOIN_SQL = """
SELECT r.event_id AS err_event_id,
       l.event_id AS click_event_id,
       l.user_id,
       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') l
JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id
 AND l.ts >= r.ts
 AND epoch_us(l.ts) <= epoch_us(r.ts) + 21600000000
"""
