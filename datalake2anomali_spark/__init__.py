"""datalake2anomali_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``cert-orangecyberdefense/datalake2anomali`` (a CTI
IOC/bulletin ETL connector; see SURVEY.md), generalized into reusable,
100-TB-scale DataFrame transforms, plus the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) a large-scale
training-data pipeline needs.

Layout
------
- ``session``    SparkSession factory tuned for local[32] testing / cluster scale
- ``io``         parquet table loaders (driver testdata) + schema normalization
- ``plans``      named relational query plans (TPC-H-ish breadth queries)
- ``ioc``        reference-parity IOC pipeline (EP-A/EP-B): specs, indicators,
                 payload assembly, upsert routing
- ``llm``        dedup / similarity / text-analysis / multimodal operators
- ``streaming``  structured-streaming windows, watermarks, incremental cursor
- ``sources``    REST-style sources with projection/predicate pushdown (mocked)
- ``sinks``      partitioned API sink with adaptive batching + rate limiting
"""

__version__ = "0.1.0"
