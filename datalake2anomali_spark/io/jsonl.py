"""JSONL (newline-delimited JSON) source/sink for document corpora.

JSONL is the interchange format of LLM training pipelines (one document
object per line, gzip-friendly, streamable), so the engine speaks it as a
first-class source/sink next to parquet.  Spark's native ``json`` format
does the heavy lifting; the two contracts this module adds are the ones
that matter at 100 TB:

- **Writes are partitioned + compressed**: hive partitioning gives readers
  directory pruning exactly as for parquet; per-file gzip keeps the wire
  format what downstream tokenizer jobs expect.
- **Reads take an explicit schema, always.**  Schema inference is a full
  extra pass over the data before the real scan even starts — harmless on a
  laptop, catastrophic on a 100 TB corpus.  ``read_jsonl`` therefore has no
  inference path; callers pass the schema (or reuse :data:`DOCUMENT_SCHEMA`).
  Malformed lines land in ``_corrupt_record`` (PERMISSIVE mode) instead of
  killing the job, mirroring how a crawl ingest actually behaves.

The reference has no file sink at all (it PATCHes an HTTP API,
``/root/reference/src/Datalake2Anomali.py:302-307``); like ``io/corpus.py``
this is part of the mandated training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Default schema for the driver's ``documents`` table serialized as JSONL.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    compression: str = "gzip",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as (optionally hive-partitioned, gzipped) JSONL.

    ``n_files`` coalesces before the write to bound output file count — a
    shuffle-free narrowing, appropriate because JSONL files are line-
    splittable only when uncompressed; with gzip each file is one reader
    task, so file count should track downstream parallelism.
    """
    out = df.coalesce(n_files) if n_files is not None else df
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-explicit JSONL scan (PERMISSIVE: malformed lines become NULL
    rows carrying the raw line in ``_corrupt_record`` when ``keep_corrupt``).

    No inference overload on purpose — see the module docstring.
    """
    if keep_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
