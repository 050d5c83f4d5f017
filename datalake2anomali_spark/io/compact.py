"""Small-file compaction for partitioned parquet datasets.

Streaming ingests and fine-grained MERGEs (:mod:`..operators.merge`)
fragment a lake table into thousands of KB-scale files; at 100 TB the
footer-read and task-launch overhead of small files dominates scan time
long before bytes do (every file costs a driver listing entry, a footer
round-trip, and usually a whole task).  Compaction is the maintenance
operator every table format ships (Iceberg ``rewrite_data_files``, Delta
``OPTIMIZE``); this is the raw-parquet equivalent:

- :func:`dataset_file_stats` lists the dataset once and reports per-hive-
  partition file counts and bytes — the decision input.  (Local
  ``os.walk``; on a cluster this is one ``FileSystem.listFiles`` pass —
  same contract, swap the walker.)
- :func:`compact_dataset` rewrites with ``repartitionByRange`` over
  ``(partition_cols…, order_col)`` into ``ceil(total_bytes /
  target_file_bytes)`` output ranges.  Because ranges are contiguous in
  the sort order and the partition columns lead it, each hive partition
  receives contiguous ranges — bounded file counts per partition — AND
  files inherit disjoint ``order_col`` min/max spans, so compaction also
  *improves* downstream pruning instead of merely merging bytes (the same
  argument as ``io/corpus.py``).  The write is a full overwrite of the
  destination: compaction is content-preserving by contract, verified by
  the roundtrip query's checksum oracle.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_file_stats(path: str) -> dict[str, tuple[int, int]]:
    """Per-hive-partition ``{partition_dir: (n_files, total_bytes)}`` for a
    local dataset; '' key for unpartitioned files at the root."""
    out: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(path):
        data = [f for f in filenames if f.endswith(".parquet")]
        if not data:
            continue
        rel = os.path.relpath(dirpath, path)
        key = "" if rel == "." else rel
        n, b = out.get(key, (0, 0))
        out[key] = (
            n + len(data),
            b + sum(os.path.getsize(os.path.join(dirpath, f)) for f in data),
        )
    return out


def total_files(path: str) -> int:
    return sum(n for n, _ in dataset_file_stats(path).values())


def compact_dataset(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_cols: list[str],
    order_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite ``src`` into ``dst`` with range-clustered, size-targeted
    files; returns the compacted DataFrame (lazy — the write has already
    happened).  Output range count = ``ceil(source_bytes /
    target_file_bytes)`` (min 1); parquet encodes tighter than its own
    on-disk size re-encodes, so treat ``target_file_bytes`` as an upper
    bound, not an exact size.
    """
    stats = dataset_file_stats(src) if os.path.isdir(src) else {}
    src_bytes = sum(b for _n, b in stats.values())
    n_ranges = max(1, math.ceil(src_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    cols = [F.col(c) for c in partition_cols] + [F.col(order_col)]
    writer = (
        df.repartitionByRange(n_ranges, *cols)
        .sortWithinPartitions(*partition_cols, order_col)
        .write.mode("overwrite")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dst)
    return spark.read.parquet(dst)
