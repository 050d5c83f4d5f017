"""Shared helpers for the LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan has fewer splits than cores.

    The hash/signature/feature stages in this package are map-only, so their
    parallelism is whatever the scan gives them.  A 100 TB corpus arrives in
    thousands of splits and passes through untouched; a bench-scale
    single-file parquet (1 split) gets fanned out so the Arrow-batched
    kernels use every core instead of one.
    """
    sc = df.sparkSession.sparkContext
    n = df.rdd.getNumPartitions()
    return df.repartition(sc.defaultParallelism) if n < sc.defaultParallelism else df
