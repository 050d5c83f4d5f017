"""Parquet loaders for the driver's synthetic star schema.

These are thin wrappers over ``spark.read.parquet`` — scans stay fully
declarative so Catalyst keeps column pruning + predicate pushdown (check with
``df.explain``: ``PushedFilters`` / ``ReadSchema`` reach the parquet scan).

The one normalization: ``events.ts`` is written as parquet TIMESTAMP(NANOS),
which Spark cannot represent natively. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column scans as a long
(nanoseconds since epoch); we truncate to microseconds — matching exactly what
DuckDB does when it reads the same file — and expose a TimestampType column.
The div-by-1000 is a codegen'd JVM expression, so pushdown/pruning on the
remaining columns is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ns → µs truncation (floor): identical to DuckDB's read of the file.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so plans can be written in Spark SQL as well."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
