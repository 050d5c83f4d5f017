"""Copy-on-write MERGE INTO over partitioned parquet (Delta-less upsert).

The lake-side upsert problem at 100 TB: applying a (relatively small)
batch of updates/inserts to a huge partitioned table without rewriting the
table.  Table formats (Delta/Iceberg) solve it transactionally; this is
the same *dataflow* on raw parquet, and the cost model is identical:

1. **Partition pruning by the source.** The distinct partition values of
   the source batch (tiny — broadcast) semi-join the target, so only the
   affected partitions' rows are ever read for rewrite.  Every other
   partition is untouched bytes on disk.
2. **Full-outer merge on the key.** Source-wins column resolution gives
   UPDATE for matched keys, INSERT for source-only keys, and copies
   target-only rows through — MERGE INTO semantics as one join.
3. **Dynamic partition overwrite.** ``partitionOverwriteMode=dynamic``
   replaces exactly the partitions present in the merged output; the
   write cost is proportional to the affected partitions, not the table.

Caveat vs a real table format (stated, not hidden): the rewrite is not
atomic — a crash mid-write can leave an affected partition half-replaced,
which Delta's transaction log would prevent.  The merged relation is
``localCheckpoint``-materialized before the write both to keep executors
from re-reading the partitions being overwritten and because Spark
(correctly) refuses to overwrite a path its plan still scans.

Reference parity: generalizes the reference's per-record upsert routing
(`src/Datalake2Anomali.py:442-449`, SURVEY §2 K4/J4 — INSERT-vs-UPDATE
decided per advisory against sink state) into a set-oriented lake-side
MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Upsert ``source`` into the parquet table at ``target_path``.

    ``source`` must carry the full target schema (including the partition
    column).  Matched keys take the source row (UPDATE), unmatched source
    keys are appended (INSERT) — including into brand-new partitions —
    and unmatched target rows in affected partitions are copied through.
    """
    target = spark.read.parquet(target_path)
    data_cols = list(target.columns)
    missing = set(data_cols) - set(source.columns)
    if missing:
        raise ValueError(f"source is missing target columns: {sorted(missing)}")

    affected = source.select(partition_col).distinct()
    hit = target.join(F.broadcast(affected), [partition_col], "leftsemi")

    t, s = hit.alias("t"), source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
    merged = t.join(s, cond, "full_outer").select(
        *[F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in data_cols]
    )
    # materialize before touching the input path (bounded: affected
    # partitions + source only)
    merged = merged.localCheckpoint(eager=True)

    prior = spark.conf.get(_OVERWRITE_MODE, None)
    spark.conf.set(_OVERWRITE_MODE, "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
    finally:
        if prior is None:
            spark.conf.unset(_OVERWRITE_MODE)
        else:
            spark.conf.set(_OVERWRITE_MODE, prior)
    # the session caches the path's file listing; drop it so readers see
    # the rewritten partitions instead of the deleted pre-merge files
    spark.catalog.refreshByPath(target_path)
