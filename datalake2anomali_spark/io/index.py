"""Secondary value index over a versioned table, maintained through the
change feed.

The index is itself a small versioned table mapping ``(value,
partition, n)`` — for every distinct value of the indexed column, the
partitions holding it and how many rows — bucketed by a hash of the
value so point lookups prune the index read too.  It exists for the
two things manifest bloom filters cannot do: EXACT pruning (a bloom
false positive reads an extra partition; the index never does), and
post-hoc creation (indexing a column never requires rewriting the
table, because the index derives from reads).

Maintenance is incremental and idempotent: a :class:`..io.publish
.TableFollower` cursor walks the base table's commits; each refresh
diffs the followed span (Delta-CDF shape), reduces it to the touched
``(value, partition)`` pairs, RECOMPUTES those pairs' true counts from
the target snapshot restricted to the touched partitions (partition-
pruned — incremental cost scales with the delta's partition footprint,
not the table), and applies them as one mixed upsert/delete CDC commit
(:func:`..io.publish.cdc_apply_versioned`).  Recomputing from the
target snapshot instead of folding signed deltas is what makes a
replayed crash span harmless — the at-least-once cursor turns into
exactly-once index state for free.

At 100 TB: the index is ~|distinct values × partitions containing
them| rows — metadata-scale; refresh reads only partitions the span
touched; lookups read one index bucket then exactly the partitions
holding the value.

NULL values are not indexed (SQL equality never matches NULL);
look NULLs up with a full predicate read.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .publish import (
    TableFollower,
    cdc_apply_versioned,
    init_table,
    read_manifest,
    read_snapshot,
)

_META = "_INDEX.json"


def _bucket_expr(value_col, n_buckets: int):
    return F.pmod(
        F.xxhash64(value_col.cast("string")), F.lit(n_buckets)
    ).cast("string")


def _meta(index_root: str) -> dict:
    with open(os.path.join(index_root, _META), encoding="utf-8") as fh:
        return json.load(fh)


def _follower(index_root: str, meta: dict) -> TableFollower:
    return TableFollower(
        meta["root"],
        meta["partition_col"],
        meta["key_cols"],
        os.path.join(index_root, "_follower"),
    )


def create_value_index(
    spark: SparkSession,
    root: str,
    partition_col: str,
    col: str,
    key_cols: list[str],
    index_root: str,
    n_buckets: int = 16,
) -> int:
    """Bootstrap the index from the base table's CURRENT snapshot and pin
    the follower cursor at that version.  Returns the indexed version."""
    base_v = read_manifest(root)["version"]
    snap = read_snapshot(spark, root, partition_col, version=base_v)
    if col not in snap.columns:
        raise ValueError(f"no column {col!r} to index")
    idx = (
        snap.filter(F.col(col).isNotNull())
        .groupBy(
            F.col(col).alias("value"),
            F.col(partition_col).cast("string").alias("partition"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket", _bucket_expr(F.col("value"), n_buckets))
    )
    init_table(spark, idx, index_root, "bucket")
    with open(os.path.join(index_root, _META), "w", encoding="utf-8") as fh:
        json.dump(
            {
                "root": root,
                "partition_col": partition_col,
                "col": col,
                "key_cols": list(key_cols),
                "n_buckets": n_buckets,
            },
            fh,
            sort_keys=True,
        )
    _follower(index_root, _meta(index_root)).commit(base_v)
    return base_v


def _follow_renames(index_root: str, meta: dict) -> dict:
    """Advance the index's recorded column names through renames the
    base table committed AFTER the follower's cursor (the version the
    index state is correct through — the anchor that keeps a pre-index
    rename of a since-reused name from misapplying).  The updated meta
    persists before any data work so a crash mid-refresh replays with
    the right names; the persisted ``schema_through`` watermark marks
    the base version whose schema events are already reflected, so the
    replay skips them instead of re-matching a rename's ``to`` name
    against the now-updated meta (which would spuriously raise the
    reuse refusal and brick the index).  A DROP of the indexed column
    has no rename event and surfaces as the loud missing-column read
    error — recreate the index."""
    from .publish import _schema_events

    cursor = _follower(index_root, meta).position()
    if cursor is None:
        return meta
    base = read_manifest(meta["root"])
    # Idempotence anchor: events at or below either the follower cursor
    # (index data correct through) or the persisted schema watermark
    # (names already followed — a crash landed meta but not the cursor)
    # are reflected already and must not replay.
    anchor = max(cursor, meta.get("schema_through", cursor))
    # renames and adds replay together in the reader's exact event order
    # (publish._schema_events — the shared merge, so the two replays can
    # never diverge).  Two ways a tracked identity dies, both refused
    # loudly because silently following the impostor would heal touched
    # pairs to the wrong column's stats:
    #  - an ADD of a tracked name (the column was dropped, the name
    #    reused by a fresh column);
    #  - a rename of ANOTHER column INTO a tracked name (legal only when
    #    the tracked column was dropped first — same reuse, different
    #    event).
    changed = False
    for v, kind, ev in _schema_events(base):
        if v <= anchor:
            continue
        tracked = {meta["col"], meta["partition_col"], *meta["key_cols"]}
        if kind == 1:
            if ev["name"] in tracked:
                raise ValueError(
                    f"column {ev['name']!r} tracked by the index at "
                    f"{index_root!r} was dropped and re-added in the base "
                    f"table (add log v{ev['v']}); the index no longer "
                    "describes a live column — recreate it"
                )
            continue
        if ev["to"] in tracked:
            raise ValueError(
                f"column {ev['to']!r} tracked by the index at "
                f"{index_root!r} was dropped and another column "
                f"({ev['from']!r}) renamed onto its name in the base "
                f"table (rename log v{ev['v']}); the index no longer "
                "describes a live column — recreate it"
            )
        for field in ("col", "partition_col"):
            if meta[field] == ev["from"]:
                meta[field] = ev["to"]
                changed = True
        if ev["from"] in meta["key_cols"]:
            meta["key_cols"] = [
                ev["to"] if k == ev["from"] else k for k in meta["key_cols"]
            ]
            changed = True
    if changed:
        meta["schema_through"] = base["version"]
        tmp = os.path.join(index_root, _META + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(meta, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(index_root, _META))
    return meta


def refresh_value_index(spark: SparkSession, index_root: str) -> int:
    """Advance the index to the base table's current version.  No-op when
    caught up.  Idempotent under crash-replay (see module docstring).
    Renames of the indexed/key columns in the followed span are followed
    automatically (:func:`_follow_renames`); the CDF itself aligns
    schema evolution inside the span (``table_changes``).
    Returns the version the index now reflects."""
    meta = _follow_renames(index_root, _meta(index_root))
    col, pcol = meta["col"], meta["partition_col"]
    follower = _follower(index_root, meta)
    changes, target_v = follower.poll(spark)
    if changes is None:
        return target_v

    def _side(prefix: str, kinds: list[str]) -> DataFrame:
        vcol = col if col in meta["key_cols"] else f"{prefix}_{col}"
        pc = pcol if pcol in meta["key_cols"] else f"{prefix}_{pcol}"
        return (
            changes.filter(F.col("change_type").isin(kinds))
            .filter(F.col(vcol).isNotNull())
            .select(
                F.col(vcol).alias("value"),
                F.col(pc).cast("string").alias("partition"),
            )
        )

    touched = (
        _side("pre", ["removed", "changed"])
        .union(_side("post", ["added", "changed"]))
        .distinct()
        # lazy checkpoint, bounded by the span's churn: the partition
        # collect right below materializes it in its own job (guide §5)
        .localCheckpoint(eager=False)
    )
    parts = {r["partition"] for r in touched.select("partition").distinct().collect()}
    if not parts:
        follower.commit(target_v)
        return target_v

    base = read_snapshot(
        spark, meta["root"], pcol, version=target_v,
        partition_filter=lambda p: p in parts,
    )
    truth = (
        base.filter(F.col(col).isNotNull())
        .groupBy(
            F.col(col).alias("value"),
            F.col(pcol).cast("string").alias("partition"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(touched), ["value", "partition"], "leftsemi")
    )
    ops = touched.join(truth, ["value", "partition"], "left").select(
        "value",
        "partition",
        F.col("n"),
        _bucket_expr(F.col("value"), meta["n_buckets"]).alias("bucket"),
        F.when(F.col("n").isNull(), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("_op"),
    ).localCheckpoint(eager=False)  # CDC apply takes several actions over
    # this frame (op validation, affected-partition collect, the write,
    # commit stats); without the checkpoint each one re-executes the
    # base-table read + groupBy lineage behind `truth`.  Bounded by the
    # span's churn, like `touched`.
    cdc_apply_versioned(
        spark, index_root, ops, ["value", "partition"], "bucket"
    )
    follower.commit(target_v)
    return target_v


def index_lookup_partitions(
    spark: SparkSession, index_root: str, value
) -> set[str]:
    """The exact set of base-table partitions holding ``value`` — one
    bucket-pruned read of the index table."""
    meta = _meta(index_root)
    bucket = spark.range(1).select(
        _bucket_expr(F.lit(value), meta["n_buckets"]).alias("b")
    ).collect()[0]["b"]
    idx = read_snapshot(
        spark, index_root, "bucket",
        partition_filter=lambda p: p == bucket,
    )
    return {
        r["partition"]
        for r in idx.filter(F.col("value") == F.lit(value))
        .select("partition")
        .distinct()
        .collect()
    }


def indexed_read(
    spark: SparkSession, index_root: str, value, refresh: bool = True
) -> DataFrame:
    """Point lookup through the index: read ONLY the partitions the index
    proves can hold ``value``, then apply the exact equality filter.

    Correctness requires the index and the base read to agree on a
    version — the partition filter's safety contract.  ``refresh=True``
    (default) advances the index first; ``refresh=False`` refuses a
    stale index instead of silently missing newly written rows.  Either
    way the base table is read PINNED at the version the index reflects,
    so a writer landing between the freshness check and the scan cannot
    slip rows past the stale partition set.  (Concurrent refreshers of
    the same index are a single-maintainer contract, as with any
    follower cursor.)"""
    meta = _meta(index_root)
    if refresh:
        pinned = refresh_value_index(spark, index_root)
    else:
        cur = read_manifest(meta["root"])["version"]
        pos = _follower(index_root, meta).position()
        if pos != cur:
            raise ValueError(
                f"index at {index_root!r} reflects v{pos} but the table is "
                f"at v{cur}; refresh it or pass refresh=True"
            )
        pinned = cur
    parts = index_lookup_partitions(spark, index_root, value)
    return read_snapshot(
        spark, meta["root"], meta["partition_col"], version=pinned,
        partition_filter=lambda p: p in parts,
    ).filter(F.col(meta["col"]) == F.lit(value))
