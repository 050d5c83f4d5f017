"""Bucketed table layout: shuffle-free co-located joins and aggregations.

The single biggest line item in a 100-TB join is the shuffle: both sides
are hash-exchanged on the key before the sort-merge.  Bucketing moves that
exchange to WRITE time, once — each side is stored pre-hash-partitioned
(``bucketBy``) and pre-sorted (``sortBy``) on the join key, so every
subsequent join or aggregation on that key reads co-located buckets and
skips both the exchange and (with ``sortBy``) the sort.  For a fact table
joined daily against the same key, one write-side shuffle amortizes over
every downstream query.

Equality filters on the bucket key also prune at the *bucket* level
(``SelectedBucketsCount`` in the scan) — only 1/n of the files are read
before row-group stats even apply.

Both sides must agree on (key, bucket count); mismatched counts fall back
to a normal shuffle on the smaller-bucketed side.  Buckets are files, so
pick ``n_buckets`` ≈ table_size / target_file_size (e.g. 100 TB / 1 GB →
~100k buckets); too few buckets makes giant files, too many makes a
small-file problem.

Reference parity: the reference re-downloads and re-joins its whole
dataset every cron tick (SURVEY §3); bucketing is the lake-side layout
that makes the re-join cost scan-only at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table registered in the catalog.

    ``path`` makes it an external table (data survives ``DROP TABLE``);
    bucketing metadata lives in the catalog either way — Spark's v1
    bucketing is catalog-bound, which is why this writes a *table*, not a
    bare directory.
    """
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    When both sides were written with ``write_bucketed`` on the same key
    and bucket count, the physical plan is a sort-merge join with ZERO
    ``Exchange`` operators (asserted in ``tests/test_bucketing.py``) —
    each task reads bucket i from both sides locally.
    """
    keys = [key] if isinstance(key, str) else key
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)
