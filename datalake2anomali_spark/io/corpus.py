"""Corpus materialization: partitioned, range-clustered parquet output.

The last stage of a cleaning pipeline is writing the surviving corpus back
out, and at 100 TB the physical layout IS the query performance of every
downstream consumer:

- **Hive partitioning** on a low-cardinality column (language, source,
  dump) → partition pruning: a reader asking for one language never lists
  the rest.
- **Range clustering** within each partition (``repartitionByRange`` on
  (partition, order) + ``sortWithinPartitions``) → each output file covers
  a disjoint ``order_col`` range, so parquet row-group min/max statistics
  prune file scans for id-range predicates, and id-ordered consumers
  (sequence packing!) read sequentially instead of shuffling.
- **File count control** — ``n_files`` bounds output file size.  Range
  partitioning samples the data to pick balanced boundaries (one extra
  sampling job — the price of balanced files, same trade Spark's own
  ``df.sort`` makes).

The reference has no bulk file sink (it PATCHes an HTTP API,
``src/Datalake2Anomali.py:302-307``); this is the training-data-pipeline
materialization step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: str = "lang",
    order_col: str = "doc_id",
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_by``, each partition's
    files covering disjoint sorted ``order_col`` ranges."""
    (
        df.repartitionByRange(n_files, F.col(partition_by), F.col(order_col))
        .sortWithinPartitions(partition_by, order_col)
        .write.mode(mode)
        .partitionBy(partition_by)
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Scan a materialized corpus; partition-column filters prune directories
    (check ``.explain``: PartitionFilters), ``order_col`` ranges prune files
    via parquet statistics."""
    return spark.read.parquet(path)
