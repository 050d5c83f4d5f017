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

#: State per user = (finalized error timestamps still inside the trailing
#: horizon of the per-key watermark; a pending buffer of events the
#: watermark has not yet passed; the per-key max event time).  Both parts
#: are bounded: ``recent_us`` by window density, the pending buffer by
#: lateness-interval density — neither grows with stream lifetime.
BURST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("recent_us", T.ArrayType(T.LongType())),
        T.StructField("pend_ids", T.ArrayType(T.LongType())),
        T.StructField("pend_ts", T.ArrayType(T.LongType())),
        T.StructField("max_us", T.LongType()),
    ]
)


def _make_burst_updater(n_alert: int, window_us: int, lateness_us: int):
    import bisect

    def finalize(recent: list[int], ripe: list[tuple[int, int]]):
        """Count each ripe event's trailing window over finalized ∪ ripe
        timestamps (pending events are all strictly later than every ripe
        event, so they cannot fall in a ripe event's trailing window)."""
        merged = sorted(recent + [t for _, t in ripe])
        out_ids, out_ts, out_n = [], [], []
        for eid, t in ripe:
            n = bisect.bisect_right(merged, t) - bisect.bisect_left(merged, t - window_us)
            if n >= n_alert:
                out_ids.append(int(eid))
                out_ts.append(int(t))
                out_n.append(int(n))
        return merged, out_ids, out_ts, out_n

    def emit(key, out_ids, out_ts, out_n):
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [key[0]] * len(out_ids),
                "ts_us": out_ts,
                "n_recent": out_n,
            }
        )

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # idle-key flush (continuous-stream mode): force-finalize the
            # pending buffer in event-time order, then drop the shard.
            recent, pend_ids, pend_ts, _ = state.get
            ripe = sorted(zip(pend_ids, pend_ts), key=lambda p: (p[1], p[0]))
            _, out_ids, out_ts, out_n = finalize(list(recent), ripe)
            state.remove()
            if out_ids:
                yield from emit(key, out_ids, out_ts, out_n)
            return
        if state.exists:
            recent, pend_ids, pend_ts, max_us = state.get
            recent = list(recent)
            pending = list(zip(pend_ids, pend_ts))
        else:
            recent, pending, max_us = [], [], None
        new = pd.concat(list(pdfs), ignore_index=True)
        rows = (
            list(zip(new["event_id"].astype(int), new["ts_us"].astype(int)))
            if not new.empty
            else []
        )
        if rows:
            # Late-row drop uses the watermark as of ARRIVAL (state from the
            # previous batch), mirroring Spark's own one-batch-behind
            # watermark: rows inside the declared bound are never dropped,
            # and a batch can't declare its own contents late.
            if max_us is not None:
                arrival_wm = max_us - lateness_us
                rows = [(i, t) for i, t in rows if t >= arrival_wm]
            batch_max = max((t for _, t in rows), default=None)
            if batch_max is not None:
                max_us = batch_max if max_us is None else max(max_us, batch_max)
        if max_us is None:
            return
        # Per-key watermark: no *kept* event is ever older than this, so an
        # event at/below it has its full trailing window in hand — its count
        # is final.  Ripen pending ∪ fresh in event-time order.
        wm = max_us - lateness_us
        pending.extend(rows)
        ripe = sorted((p for p in pending if p[1] <= wm), key=lambda p: (p[1], p[0]))
        pending = [p for p in pending if p[1] > wm]
        merged, out_ids, out_ts, out_n = finalize(recent, ripe)
        horizon = wm - window_us
        state.update(
            (
                [t for t in merged if t >= horizon],
                [i for i, _ in pending],
                [t for _, t in pending],
                max_us,
            )
        )
        try:
            state.setTimeoutDuration(_TIMEOUT_MS)
        except Exception:
            pass  # NoTimeout mode (availableNow gate run) — nothing to arm
        if out_ids:
            yield from emit(key, out_ids, out_ts, out_n)

    return update


def burst_alerts_stream(
    events_stream: DataFrame,
    n_alert: int = 2,
    window_us: int = 21600 * 1_000_000,
    lateness_us: int = 0,
    idle_timeout: bool = False,
) -> DataFrame:
    """Streaming repeat-offender detection: emit an alert row for every
    error that is the ≥``n_alert``-th from its user inside a trailing
    ``window_us`` — the stateful twin of the batch RANGE-frame query
    (``plans/temporal_queries.py: burst_alerts``), for a live bus where the
    alert must fire as the event arrives rather than in a nightly scan.

    Disorder tolerance (``lateness_us``): each event is held in a per-key
    pending buffer until the key's high-watermark (``max ts seen −
    lateness_us``) passes it, then finalized in event-time order — its
    trailing-window count at that point is provably final, so a late
    arrival that completes a burst still fires the alert for the *later*
    event it completes (matching the batch twin exactly, proven in
    ``tests/test_streaming.py: test_stream_burst_alerts_out_of_order``).
    Rows arriving later than the declared bound are dropped, exactly like
    Spark's own ``withWatermark`` late-row policy — but the watermark here
    is PER KEY, so one slow user neither stalls nor drops another user's
    events.  ``lateness_us=0`` (the default, used by the availableNow gate
    run where a single batch sees every event) finalizes each batch
    immediately with no pending buffer.

    State per key is the in-horizon finalized timestamps plus the pending
    buffer — bounded by window/lateness-interval density, not stream
    lifetime.  ``idle_timeout=True`` (continuous-stream mode) arms a
    processing-time timeout that flushes a key's pending buffer and drops
    the shard when the key goes idle; keep ``False`` for availableNow runs
    (a pending processing-time timeout forces empty micro-batches until
    every key times out, so the run never terminates).
    """
    errors = events_stream.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return errors.groupBy("user_id").applyInPandasWithState(
        _make_burst_updater(n_alert, window_us, lateness_us),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
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
