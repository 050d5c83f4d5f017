"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose every implemented operator (SURVEY.md §2 + extensions) with DuckDB
oracle twins.  Column names are aliased identically on both sides; double
aggregates use deterministic fixed-point sums (see
``datalake2anomali_spark/functions/exact.py``) so value hashes match bit-for-
bit regardless of partitioning.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake2anomali_spark.session import configure_session  # noqa: E402
from datalake2anomali_spark.plans import (  # noqa: E402
    breadth,
    ioc_queries,
    llm_queries,
    relational,
    streaming_queries,
    temporal_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return relational.q5_local_supplier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, ioc_queries, breadth, llm_queries, streaming_queries, temporal_queries):
        out.update({name: _wrap(fn) for name, fn in mod.QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    out: dict[str, str] = {}
    for mod in (relational, ioc_queries, breadth, llm_queries, streaming_queries, temporal_queries):
        out.update(mod.ORACLES)
    return out


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    return run
