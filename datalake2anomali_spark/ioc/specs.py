"""Query specs — the reference's config-as-query-language surface.

A spec mirrors one ``config.datalake_queries`` entry
(``/root/reference/src/config.py.default:31-40``): an opaque server-side
saved-search handle plus per-query metadata that the pipeline attaches to
every row the search returns (SURVEY J2), with optional per-type itype
overrides (J3).

Validation (F1, reference ``_checkProvidedDatalakeQuery``
``src/Datalake2Anomali.py:283-294``): all three required fields must be
non-empty or the spec is skipped (logged, not fatal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALID_SEVERITIES = ("low", "medium", "high", "very-high")

SPEC_SCHEMA = T.StructType(
    [
        T.StructField("query_hash", T.StringType(), True),
        T.StructField("dataset_name", T.StringType(), True),
        T.StructField("anomali_severity", T.StringType(), True),
        T.StructField("anomali_itype", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


@dataclass(frozen=True)
class QuerySpec:
    query_hash: str | None
    dataset_name: str | None
    anomali_severity: str | None
    anomali_itype: dict[str, str] | None = field(default=None)

    def is_valid(self) -> bool:
        return bool(self.query_hash) and bool(self.dataset_name) and bool(self.anomali_severity)


def _sql_str(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS STRING)"
    escaped = v.replace("'", "''")
    return f"'{escaped}'"


def _sql_map(m: dict[str, str] | None) -> str:
    if m is None:
        return "CAST(NULL AS MAP<STRING,STRING>)"
    if not m:
        return "map()"
    parts = ", ".join(f"{_sql_str(k)}, {_sql_str(v)}" for k, v in m.items())
    return f"map({parts})"


def specs_df(spark: SparkSession, specs: list[QuerySpec]) -> DataFrame:
    """Config specs → a JVM-side LocalRelation.

    Rendered as a SQL VALUES list (values escaped) rather than
    ``createDataFrame`` over Python objects: a LocalRelation evaluates and
    broadcasts without Python workers, which matters because this frame is
    broadcast-joined inside every EP-A query.
    """
    rows = ", ".join(
        f"({_sql_str(s.query_hash)}, {_sql_str(s.dataset_name)}, "
        f"{_sql_str(s.anomali_severity)}, {_sql_map(s.anomali_itype)})"
        for s in specs
    )
    return spark.sql(
        f"SELECT * FROM VALUES {rows} "
        "AS t(query_hash, dataset_name, anomali_severity, anomali_itype)"
    )


def validate_specs(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F1: split into (valid, rejected).

    Row-level validation as a filter (not a driver loop) so it scales to any
    number of specs; the rejected side is a side-output for logging/metrics,
    mirroring the reference's log-and-skip behavior.
    """
    required = ["query_hash", "dataset_name", "anomali_severity"]
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull() & (F.col(c) != "")
    return df.filter(cond), df.filter(~cond)
