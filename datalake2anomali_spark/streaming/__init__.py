"""Structured Streaming surface (SURVEY.md §2.9 / §7 step 6).

The reference's only "streaming" is a 1-second scheduler poll loop
(reference ``src/core.py:41-48``) plus a sink-side high-watermark cursor
(``src/Datalake2Anomali.py:397-404``).  This package generalizes those into
idiomatic Structured Streaming:

- :mod:`.windows` — tumbling / sliding / session window aggregations written
  as pure ``DataFrame -> DataFrame`` transforms that run identically on batch
  and streaming inputs (oracle-checked in batch mode).
- :mod:`.incremental` — ``readStream`` + ``trigger(availableNow=True)`` runs
  reproducing the reference's cron-tick semantics (T1) and the high-watermark
  cursor (T2) as a checkpoint / cursor table.
- :mod:`.stateful` — ``applyInPandasWithState`` custom stateful operator
  (arbitrary per-key state with timeouts), the escape hatch for operators the
  built-in window aggregations can't express.
"""

from datalake2anomali_spark.streaming import incremental, stateful, windows  # noqa: F401
