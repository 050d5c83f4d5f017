"""Schemas + static dimension tables for the IOC pipeline.

The reference keeps these as Python dict templates/maps
(``/root/reference/src/constants.py:1-31``); here they are explicit
StructTypes and tiny broadcast-able dimension DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Normalized indicator relation — the engine's intermediate IOC row
# (reference: INDICATOR_TEMPLATE, src/constants.py:1-11).
INDICATOR_SCHEMA = T.StructType(
    [
        T.StructField("dataset_name", T.StringType(), False),
        T.StructField("anomali_type", T.StringType(), False),
        T.StructField("anomali_itype", T.StringType(), True),
        T.StructField("anomali_severity", T.StringType(), False),
        T.StructField("atom_type", T.StringType(), False),
        T.StructField("atom_value", T.StringType(), False),
        T.StructField("hashes_md5", T.StringType(), True),
        T.StructField("threat_scores", T.ArrayType(T.IntegerType()), True),
        T.StructField("threat_tags", T.ArrayType(T.StringType()), True),
    ]
)

# Raw bulk-search scan row: one JSON positional array per atom, tagged with
# the saved-search handle it came from (reference result shape at
# src/Datalake2Anomali.py:327-343).
BULK_RAW_SCHEMA = T.StructType(
    [
        T.StructField("query_hash", T.StringType(), False),
        T.StructField("raw", T.StringType(), False),
    ]
)

# Anomali tag struct (reference: src/Datalake2Anomali.py:88-98).
TAG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("tlp", T.StringType(), False),
        ]
    )
)

# Static 6-row type dimension (reference: DTL_TO_ANOMALI_TYPE,
# src/constants.py:24-31).  A lookup miss DROPS the row (F2) — i.e. the join
# against this table is inner.
DTL_TO_ANOMALI_TYPE: dict[str, str] = {
    "fqdn": "domain",
    "domain": "domain",
    "ip": "srcip",
    "url": "url",
    "email": "email",
    "file": "md5",
}

# Fallback itype per anomali type (reference: config.default_itype,
# src/config.py.default:5-11) — the coalesce default side of J3.
DEFAULT_ITYPE: dict[str, str] = {
    "domain": "suspicious_domain",
    "srcip": "actor_ip",
    "url": "suspicious_url",
    "email": "suspicious_email",
    "md5": "mal_md5",
}


def _values_relation(spark: SparkSession, rows: list[tuple[str, str]], cols: tuple[str, str]) -> DataFrame:
    # SQL VALUES builds a JVM-side LocalRelation: evaluating (and broadcasting)
    # it never touches Python workers, unlike createDataFrame over a Python
    # list, which pickles rows into an RDD and spins a Python worker per
    # partition on EVERY evaluation (~10s of overhead per join at local[32]).
    values = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t({cols[0]}, {cols[1]})")


def atom_type_dim(spark: SparkSession) -> DataFrame:
    """The J1 dimension as a DataFrame (broadcast at join sites)."""
    return _values_relation(
        spark, list(DTL_TO_ANOMALI_TYPE.items()), ("atom_type", "anomali_type")
    )


def default_itype_dim(spark: SparkSession) -> DataFrame:
    return _values_relation(
        spark, list(DEFAULT_ITYPE.items()), ("anomali_type", "default_itype")
    )
