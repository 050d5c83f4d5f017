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
