"""Custom stateful streaming via ``applyInPandasWithState``.

The escape hatch for per-key logic the built-in window aggregations can't
express (SURVEY.md §7 "streaming session state").  Demonstrated with a
per-user running profile: event count, exact value sum, first/last seen —
state that accretes across micro-batches and is emitted in ``update`` mode.

Design notes:
- The double→fixed-point snap (``round(value * 10^s)``) happens **JVM-side
  before the Python boundary**, with the exact same ``F.round`` expression the
  batch aggregates use (functions/exact.py).  The Python operator only ever
  adds int64s, so the cumulative sum is bit-identical to the batch oracle no
  matter how events are split across micro-batches, and no rounding semantics
  are re-implemented in pandas.
- State is a tuple of plain ints — cheap to serialize, nothing pandas-shaped
  in the state store.
- Partitioning: one shuffle on ``user_id``; each executor holds the state
  shards for its keys (RocksDB state store on a real cluster).  A processing-
  time timeout evicts idle keys so 100 TB of cold users don't pin memory.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datalake2anomali_spark.functions.exact import DSUM_SQL
from datalake2anomali_spark.streaming import incremental

_SCALE = 3
_M = 10**_SCALE
_TIMEOUT_MS = 3_600_000  # idle-key eviction for continuous streams

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("fixed_sum", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the running state."""
    if state.hasTimedOut:
        state.remove()  # idle key: drop the shard, emit nothing
        return
    n, fixed_sum, first_us, last_us = state.get if state.exists else (0, 0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += int(len(pdf))
        fixed_sum += int(pdf["fixed_value"].sum())
        us = pdf["ts_us"]
        lo, hi = int(us.min()), int(us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, fixed_sum, first_us, last_us))
    try:
        state.setTimeoutDuration(_TIMEOUT_MS)
    except Exception:
        pass  # query runs with NoTimeout (availableNow mode) — nothing to arm
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [fixed_sum / _M],
            "first_us": [first_us],
            "last_us": [last_us],
        }
    )


def user_profiles_stream(events_stream: DataFrame, idle_timeout: bool = True) -> DataFrame:
    """Per-user running profile over a streaming events DataFrame.

    ``idle_timeout=True`` (the continuous-stream default) arms a processing-
    time timeout that evicts idle keys.  Pass ``False`` for availableNow
    runs: with a pending processing-time timeout the engine keeps scheduling
    empty micro-batches to fire it, so an availableNow query never reaches
    termination until every key times out.
    """
    prepared = events_stream.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * _M).cast("long").alias("fixed_value"),
    )
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


def stateful_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow run of the stateful operator; final profile per user.

    In update mode each micro-batch emits the post-batch state per touched
    key; the memory sink therefore holds one emission per (user, batch) and
    the newest one (max n_events — the state only grows) is the final profile.
    """
    events = incremental.read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out = incremental.run_to_completion(
        user_profiles_stream(events, idle_timeout=False),
        output_mode="update",
        state_partitions=2,  # 1.5k keys at bench SF; size to keyspace in prod
    )
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
        F.min("first_us").alias("first_us"),
        F.max("last_us").alias("last_us"),
    )


STATEFUL_PROFILE_SQL = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {DSUM_SQL('value', _SCALE)} AS value_sum,
       MIN(epoch_us(ts)) AS first_us,
       MAX(epoch_us(ts)) AS last_us
FROM events
GROUP BY user_id
"""


# -- streaming burst detection (stateful twin of plans/temporal_queries.py:
#    burst_alerts) --------------------------------------------------------

BURST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("n_recent", T.LongType()),
    ]
)

#: State = the user's error timestamps still inside the trailing horizon of
#: the newest event seen — bounded by window density, not stream lifetime.
BURST_STATE_SCHEMA = T.StructType([T.StructField("recent_us", T.ArrayType(T.LongType()))])


def _make_burst_updater(n_alert: int, window_us: int):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        prior: list[int] = list(state.get[0]) if state.exists else []
        new = pd.concat(list(pdfs), ignore_index=True)
        if new.empty and not prior:
            return
        new = new.sort_values("ts_us")
        ts_all = sorted(prior + new["ts_us"].tolist())
        out_ids, out_ts, out_n = [], [], []
        import bisect

        for eid, t in zip(new["event_id"], new["ts_us"]):
            lo = bisect.bisect_left(ts_all, t - window_us)
            hi = bisect.bisect_right(ts_all, t)
            n = hi - lo
            if n >= n_alert:
                out_ids.append(int(eid))
                out_ts.append(int(t))
                out_n.append(int(n))
        horizon = ts_all[-1] - window_us
        state.update(([t for t in ts_all if t >= horizon],))
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": [key[0]] * len(out_ids),
                    "ts_us": out_ts,
                    "n_recent": out_n,
                }
            )

    return update


def burst_alerts_stream(
    events_stream: DataFrame, n_alert: int = 2, window_us: int = 21600 * 1_000_000
) -> DataFrame:
    """Streaming repeat-offender detection: emit an alert row for every
    error that is the ≥``n_alert``-th from its user inside a trailing
    ``window_us`` — the stateful twin of the batch RANGE-frame query
    (``plans/temporal_queries.py: burst_alerts``), for a live bus where the
    alert must fire as the event arrives rather than in a nightly scan.

    Per user the state is only the timestamps still inside the horizon of
    the newest event (bounded by window density, not stream lifetime);
    counting is a two-sided bisect over the merged sorted list.  Assumes
    per-user event-time-ordered arrival across micro-batches (true for
    ordered file replay; a production deployment fronts this with a
    watermark-held sorting buffer).
    """
    errors = events_stream.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return errors.groupBy("user_id").applyInPandasWithState(
        _make_burst_updater(n_alert, window_us),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_burst_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow run over the events parquet; oracle-comparable to the
    batch RANGE-frame twin because a single batch sees every event."""
    from datalake2anomali_spark.plans.temporal_queries import BURST_N, BURST_WINDOW_US

    events = incremental.read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return incremental.run_to_completion(
        burst_alerts_stream(events, n_alert=BURST_N, window_us=BURST_WINDOW_US),
        output_mode="append",
        state_partitions=2,  # 150 users at gate SF; size to keyspace in prod
    )
