"""EP-B: incremental bulletin upsert — set-oriented MERGE routing.

The reference routes row-at-a-time with 2-3 HTTP round-trips per advisory
(``/root/reference/src/Datalake2Anomali.py:246-253`` probing ``:141-165``).
Spark-first, the probe is ONE left join against the sink-state relation and
the insert/update decision is a column, so the whole batch routes in a
single distributed pass:

- J4: ``updates LEFT JOIN existing ON array_contains(tags, 'world_watch_'||id)``
  — found ⇒ UPDATE (reference ``patch_existing_tipreport`` ``:189-217``),
  else INSERT (``add_new_tipreport`` ``:219-244``).
- A2/SRC7: the incremental cursor is the max ``modified_ts`` in the sink
  (``get_datetime_of_last_world_watch_report`` ``:168-183``); state lives in
  the destination, not locally (T2).

Scale notes: sink state is keyed by the natural key ``world_watch_{id}``
(S5, ``:185-186``).  At 100 TB the existing-state side is pre-projected to
(key, id, modified_ts) — array_contains is evaluated once in a generated
column, then the join is a plain equi-join Catalyst can broadcast (state
small) or shuffle-hash (state large), never a nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def natural_key(id_col: str = "id") -> F.Column:
    """S5: the idempotency tag ``world_watch_{id}``."""
    return F.concat(F.lit("world_watch_"), F.col(id_col).cast("string"))


def sink_state_keys(existing: DataFrame) -> DataFrame:
    """Project sink state to (key, tipreport_id, modified_ts).

    ``explode(tags)`` + prefix filter turns the array-membership probe
    (reference ``:155-160``) into an equi-joinable key column.
    """
    keyed = existing.select(
        F.col("id").alias("tipreport_id"),
        F.col("modified_ts").alias("existing_modified_ts"),
        F.explode("tags").alias("key"),
    ).filter(F.col("key").startswith("world_watch_"))
    # If sink state ever holds several reports under one key (the reference
    # takes the API's first hit, :155-160), keep the most recently modified —
    # deterministic, and the only shuffle in the EP-B plan (on the state
    # side, which is the smaller relation).
    return keyed.groupBy("key").agg(
        F.max_by("tipreport_id", "existing_modified_ts").alias("tipreport_id"),
        F.max("existing_modified_ts").alias("existing_modified_ts"),
    )


def route_upserts(advisories: DataFrame, existing: DataFrame) -> DataFrame:
    """J4: annotate each advisory with action ∈ {insert, update}."""
    state = sink_state_keys(existing)
    probe = advisories.withColumn("key", natural_key("id"))
    routed = probe.join(state, "key", "left")
    return routed.withColumn(
        "action",
        F.when(F.col("tipreport_id").isNull(), F.lit("insert")).otherwise(F.lit("update")),
    )


def high_watermark(existing: DataFrame, ts_col: str = "modified_ts") -> DataFrame:
    """A2/SRC7: latest sink-side timestamp — the incremental cursor."""
    return existing.agg(F.max(ts_col).alias("watermark"))


def incremental_advisories(
    advisories: DataFrame, existing: DataFrame, ts_col: str = "timestamp_updated"
) -> DataFrame:
    """SRC4: keep only advisories newer than the sink high-watermark.

    A cross join against the 1-row watermark aggregate — Catalyst broadcasts
    the single row, so this is a map-side filter, not a real cross product.
    """
    wm = high_watermark(existing)
    return (
        advisories.crossJoin(F.broadcast(wm))
        .filter((F.col("watermark").isNull()) | (F.col(ts_col) > F.col("watermark")))
        .drop("watermark")
    )
