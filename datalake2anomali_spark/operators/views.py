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


def apply_changes(
    view: DataFrame,
    changes: DataFrame,
    table_keys: list[str],
    group_keys: list[str],
    sum_cols: dict[str, int],
    minmax_cols: list[str] | None = None,
    new_snapshot: DataFrame | None = None,
) -> DataFrame:
    """Maintain a :func:`rollup_state` view from a change data feed with
    before/after images (``table_changes(include_images=True)`` /
    ``quality.snapshot_diff(include_images=True)``) — the CDC-driven
    refresh that never rescans the table OR the delta's history.

    Retraction semantics (the Flink/Materialize recipe, exact here
    because the state vector is integers): every change row contributes
    its POST image with weight +1 (added/changed) and its PRE image with
    weight −1 (removed/changed); counts and fixed-point sums absorb both
    signs in one aggregation, and an update that MOVES a row between
    groups retracts from the old group and adds to the new one for free.
    Groups whose count reaches zero drop from the view.

    ``min_<c>``/``max_<c>`` do not retract (removing the minimum cannot
    be undone by merging).  When the view carries them, pass
    ``new_snapshot`` (the post-change table): extrema are recomputed for
    exactly the groups the feed touched — work bounded by the changed
    groups, never the table — and every untouched group keeps its stored
    values byte-identical.

    A group key may be a table key (identical in both images) or a
    payload column (read per-image).  Result is bit-identical to
    ``rollup_state(new_snapshot, …)`` — pinned by the tests.
    """
    minmax_cols = minmax_cols or []
    if minmax_cols and new_snapshot is None:
        raise ValueError(
            "min/max columns cannot be retracted; pass new_snapshot so "
            "touched groups can be recomputed"
        )

    def img(col: str, prefix: str):
        return F.col(col) if col in table_keys else F.col(f"{prefix}_{col}")

    def side(df: DataFrame, prefix: str, weight: int) -> DataFrame:
        sel = [img(k, prefix).alias(k) for k in group_keys]
        for c, scale in sum_cols.items():
            m = 10**scale
            sel.append(
                F.round(img(c, prefix) * m).cast("long").alias(f"_s_{c}")
            )
        return df.select(*sel).withColumn("_w", F.lit(weight).cast("long"))

    post = side(
        changes.filter(F.col("change_type").isin("added", "changed")),
        "post",
        1,
    )
    pre = side(
        changes.filter(F.col("change_type").isin("removed", "changed")),
        "pre",
        -1,
    )
    delta = (
        post.unionByName(pre)
        .groupBy(*group_keys)
        .agg(
            F.sum("_w").alias("n_rows"),
            *[
                F.sum(F.col(f"_s_{c}") * F.col("_w")).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
    )
    # localCheckpoint: delta feeds the merge AND (with minmax) the
    # touched-group recompute — same two-consumer hygiene as the graph ops
    if minmax_cols:
        delta = delta.localCheckpoint(eager=True)

    state_cols = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    merged = (
        view.select(*group_keys, *state_cols, *[f"min_{c}" for c in minmax_cols], *[f"max_{c}" for c in minmax_cols])
        .join(
            delta.select(
                *group_keys, *[F.col(c).alias(f"_d_{c}") for c in state_cols]
            ),
            group_keys,
            "full_outer",
        )
        .select(
            *group_keys,
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
                ).alias(c)
                for c in state_cols
            ],
            *[F.col(f"min_{c}") for c in minmax_cols],
            *[F.col(f"max_{c}") for c in minmax_cols],
        )
        .filter(F.col("n_rows") > 0)
    )
    if not minmax_cols:
        return merged

    touched = delta.select(*group_keys)
    fresh = rollup_state(
        new_snapshot.join(F.broadcast(touched), group_keys, "leftsemi"),
        group_keys,
        minmax_cols=minmax_cols,
    ).select(
        *group_keys,
        *[F.col(f"min_{c}").alias(f"_f_min_{c}") for c in minmax_cols],
        *[F.col(f"max_{c}").alias(f"_f_max_{c}") for c in minmax_cols],
    )
    out = merged.join(fresh, group_keys, "left")
    sel = [*group_keys, *state_cols]
    for c in minmax_cols:
        sel.append(F.coalesce(f"_f_min_{c}", f"min_{c}").alias(f"min_{c}"))
        sel.append(F.coalesce(f"_f_max_{c}", f"max_{c}").alias(f"max_{c}"))
    return out.select(*sel)


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
