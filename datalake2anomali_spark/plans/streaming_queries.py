"""Driver-registered streaming/window queries (SURVEY.md §2.9, §7 step 6).

Entries:

- ``batch_windows`` — sliding + session window aggs as one tagged union
  (each with its full DuckDB oracle half).  The tumbling batch twin is NOT
  registered separately: ``stream_tumbling_counts`` drives the exact same
  :func:`...streaming.windows.tumbling_counts` transform against the exact
  same ``TUMBLING_SQL`` oracle, so a separate batch row added no evidence
  (driver-gate footprint consolidation, VERDICT r3 #5).
- ``stream_tumbling_counts`` — a *real* Structured Streaming run (readStream →
  watermark → window agg → availableNow → memory sink) whose result is still
  oracle-comparable, because a single availableNow batch drops nothing.
- ``stream_dedup_late`` — a 3-batch replay whose oracle pins the WATERMARK
  behaviors by value: late rows dropped, in-state duplicates collapsed,
  retransmissions of expired keys re-emitted (so the result provably differs
  from a plain ``distinct``).
- ``stream_dedup_events`` — the plain at-least-once dedup path
  (``dropDuplicatesWithinWatermark`` over a doubled stream).
- ``stateful_user_profiles`` — ``applyInPandasWithState`` custom stateful
  operator, oracle-comparable for the same reason.
- ``stream_interval_join`` — watermarked stream–stream interval join
  (clicks × errors, two-sided time bound); single availableNow batch makes
  it oracle-comparable to the batch inequality join, and the cross-batch
  state buffering is pinned in ``tests/test_streaming.py``.

Remaining multi-batch behaviors without a batch oracle (state carried across
restarts, idle-key timeout) are covered in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from datalake2anomali_spark.plans import analytics_queries as _analytics
from datalake2anomali_spark.plans import temporal_queries as _temporal
from datalake2anomali_spark.streaming import incremental, joins, stateful, windows

QUERIES = {
    "stream_burst_alerts": stateful.stream_burst_alerts,
    "stream_interval_join": joins.stream_click_error_join,
    "stream_interval_join_outer": joins.stream_click_error_join_outer,
    "stream_interval_join_full": joins.stream_click_error_join_full,
    "batch_windows": windows.batch_windows_query,
    "stream_tumbling_counts": incremental.stream_tumbling_counts,
    "stream_dedup_events": incremental.stream_dedup_events,
    "stream_sessionize": incremental.stream_sessionize,
    "stream_view_maintenance": incremental.stream_view_maintenance,
    "stream_scd2": incremental.stream_scd2,
    "stream_upsert_exactly_once": incremental.stream_upsert_exactly_once,
    "stream_dedup_late": incremental.stream_dedup_late,
    "stateful_user_profiles": stateful.stateful_user_profiles,
    "stream_enrich_snapshot": incremental.stream_enrich_snapshot,
    "stream_into_hidden": incremental.stream_into_hidden,
}

ORACLES = {
    "stream_burst_alerts": _temporal.BURST_SQL,
    "stream_interval_join": joins.STREAM_INTERVAL_JOIN_SQL,
    "stream_interval_join_outer": joins.STREAM_INTERVAL_JOIN_OUTER_SQL,
    "stream_interval_join_full": joins.STREAM_INTERVAL_JOIN_FULL_SQL,
    "batch_windows": windows.BATCH_WINDOWS_SQL,
    "stream_tumbling_counts": windows.TUMBLING_SQL,
    "stream_dedup_events": incremental.STREAM_DEDUP_SQL,
    "stream_sessionize": windows.SESSION_WINDOW_SQL,
    # the streaming refresh must converge to the batch rollup exactly
    "stream_view_maintenance": _analytics.VIEW_SQL,
    # the streaming CDC-apply must converge to the batch SCD2 exactly
    "stream_scd2": _temporal.SCD2_SQL,
    # exactly-once ingestion must converge to the plain batch rollup
    "stream_upsert_exactly_once": incremental.STREAM_EXACTLY_ONCE_SQL,
    "stream_dedup_late": incremental.STREAM_DEDUP_LATE_SQL,
    "stateful_user_profiles": stateful.STATEFUL_PROFILE_SQL,
    # per-tick enrichment against the dim's then-current snapshot must
    # equal the batch replay of (tick, user-parity)-cased scores
    "stream_enrich_snapshot": incremental.STREAM_ENRICH_SQL,
    # the exactly-once streaming MERGE into the hidden-partitioned table
    # must equal the batch replay of the same window (between-predicate)
    "stream_into_hidden": incremental.STREAM_INTO_HIDDEN_SQL,
}
