"""Schema evolution across dataset generations (schema-on-read alignment).

A 100-TB lake is never one schema: columns get added (``quality`` scores,
provenance), old generations lack them, and types widen (int → bigint).
Rewriting 100 TB to backfill is off the table — the engine must read every
generation *as written* and reconcile at scan time:

- ``read_evolving``: one multi-path parquet scan with ``mergeSchema`` — the
  footers are unioned driver-side (a metadata operation), missing columns
  come back null, and predicate pushdown / column pruning still reach each
  file with its own physical schema.
- ``align_to_schema``: explicit projection of one DataFrame onto a target
  schema — missing columns become typed nulls, present columns are cast
  (safe widenings) — the building block when generations live in separate
  tables/paths and you want the union to be an auditable expression rather
  than reader magic.

Both are pure plan transformations: no data movement, no UDFs; the casts
and null-fills ride inside whole-stage codegen on top of the scan.

Reference parity: the reference's rows are schema-on-read Python dicts with
``.get(..., default)`` per field (SURVEY §1, `src/Datalake2Anomali.py:
362-374`); these operators are that same late-binding tolerance expressed
as typed, verifiable DataFrame projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Scan several parquet generations as one relation (union schema)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: fill missing columns with typed
    nulls, cast present ones, drop extras, and order columns to match."""
    cols = []
    present = set(df.columns)
    for fld in target.fields:
        if fld.name in present:
            cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
        else:
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    return df.select(*cols)


def union_generations(dfs: list[DataFrame]) -> DataFrame:
    """Union generations under the merged (by-name) schema.

    Later generations win type width: each frame is aligned to the union of
    all schemas (later fields override earlier same-name fields), then
    unioned by name.  Equivalent to ``unionByName(allowMissingColumns=
    True)`` but with the target schema explicit and inspectable.
    """
    merged: dict = {}
    for df in dfs:
        for fld in df.schema.fields:
            merged[fld.name] = fld
    target = StructType(list(merged.values()))
    out = None
    for df in dfs:
        aligned = align_to_schema(df, target)
        out = aligned if out is None else out.unionByName(aligned)
    return out
