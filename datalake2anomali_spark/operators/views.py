"""Incremental materialized-view maintenance for mergeable rollups.

A 100 TB deployment cannot rescan history to refresh a daily rollup; it
merges yesterday's stored view with an aggregate of the new delta.  That
only works when every measure is *mergeable* — decomposable into partial
states combined by an associative op.  This module fixes a canonical
mergeable state vector per measure set:

- ``n_rows``  — count; merges by ``SUM``.
- ``sum_<c>`` — fixed-point scaled-long sum (``functions/exact.py``
  argument: snapped integers add exactly in any merge order, so a view
  merged from 400 daily deltas is bit-identical to a full recompute —
  the property the oracle checks).
- ``min_<c>`` / ``max_<c>`` — merge by ``MIN`` / ``MAX``.

Averages, rates, etc. are derived at READ time from the state vector —
never stored, since they don't merge.  Exact distinct counts don't merge
either; store an HLL sketch instead (``functions/sketches.py``) — kept
out of this vector so everything here is exact.

:func:`rollup_state` builds the state vector for any frame (full history
or a delta — same code path, the symmetry that makes maintenance
trivially correct); :func:`merge_states` combines any number of state
frames.  Both are single hash aggregations with map-side partials.

The reference connector has no aggregate-view surface (682-LoC REST
client); pipeline extension per the build brief.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, int] | None = None,
    minmax_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable state vector per key group: ``n_rows`` + scaled-long
    ``sum_<c>`` per (col → decimal scale) entry + ``min_<c>``/``max_<c>``
    per minmax col.  One aggregation; run it over the full history once,
    then only over deltas."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, scale in (sum_cols or {}).items():
        m = 10**scale
        aggs.append(F.sum(F.round(F.col(c) * m).cast("long")).alias(f"sum_{c}"))
    for c in minmax_cols or []:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(views: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine state vectors (view + deltas): union, then one aggregation
    applying each column's merge op — ``SUM`` for counts/sums, ``MIN``/
    ``MAX`` for extrema.  Column roles are recognized by the
    :func:`rollup_state` naming contract."""
    if not views:
        raise ValueError("merge_states needs at least one state frame")
    u = reduce(DataFrame.unionByName, views)
    aggs = []
    for c in u.columns:
        if c in keys:
            continue
        if c == "n_rows" or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"column {c!r} has no registered merge op")
    return u.groupBy(*keys).agg(*aggs)
