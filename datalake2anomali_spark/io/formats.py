"""CSV and ORC source/sink contracts — the remaining interchange formats
a corpus pipeline meets (CSV from upstream exports and labeling tools,
ORC from Hive-era warehouses), under the same two rules as
:mod:`.jsonl`:

- **Reads take an explicit schema, always.**  CSV inference is a full
  extra pass AND quietly mistypes (a column of numeric-looking ids
  becomes DOUBLE and corrupts); ORC carries its own schema in the file
  footer, but the reader still pins the EXPECTED schema so a drifted
  upstream fails loudly at plan time instead of poisoning downstream
  joins (the ``tests/test_testdata_canary.py`` lesson generalized).
- **Writes are hive-partitioned**, so directory pruning works exactly as
  for parquet.

CSV-specific hazards are handled the way a 100 TB ingest must:
PERMISSIVE mode with ``_corrupt_record`` capture (a bad row is data to
quarantine, not a job kill), explicit ``multiLine=false`` (multiline CSV
is not splittable — one file becomes one task), and quoting/escaping
pinned so text containing the delimiter round-trips.

The reference has no file surface at all (HTTP connector); extension
per the training-data-pipeline brief, sibling of ``io/jsonl.py`` /
``io/corpus.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    compression: str = "gzip",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned, header-carrying, quoted CSV (gzip per file —
    like gzipped JSONL, each file is one reader task downstream)."""
    out = df.coalesce(n_files) if n_files is not None else df
    writer = (
        out.write.mode(mode)
        .option("header", "true")
        .option("compression", compression)
        .option("quote", '"')
        .option("escape", '"')
    )
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-explicit CSV scan; malformed rows quarantine into
    ``_corrupt_record`` instead of failing the job."""
    if keep_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "false")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned ORC (zlib default — the warehouse-side norm)."""
    writer = df.write.mode(mode)
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    expected_schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan with an optional expected-schema check: ORC is
    self-describing, but a silently drifted upstream schema should fail
    at plan time, not at the first bad join.  Column order is not part
    of the contract (ORC readers resolve by name)."""
    df = spark.read.orc(path)
    if expected_schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields if f.name != "_corrupt_record"}
        want = {f.name: f.dataType for f in expected_schema.fields}
        # hive partition columns come back typed by directory inference;
        # compare by name presence + type for the data columns
        missing = [n for n in want if n not in got]
        drifted = [
            (n, str(got[n]), str(want[n]))
            for n in want
            if n in got and got[n] != want[n]
        ]
        if missing or drifted:
            raise ValueError(
                f"ORC schema drift at {path!r}: missing={missing} "
                f"drifted={drifted}"
            )
    return df
