"""Order-independent, bit-deterministic aggregates over double columns.

Why: a plain ``SUM(double)`` is order-dependent — partial aggregation across N
shuffle partitions adds the values in a different order than a single-threaded
engine would, so the last few ulps differ run-to-run and engine-to-engine.
That is fine for analytics but fails an exact value-hash comparison against a
DuckDB oracle, and the divergence *grows with scale* (more partitions → more
reorderings).

Fix: snap each row's value to a fixed decimal grid *before* aggregating —
``round(x * 10^s)`` is a deterministic per-row IEEE operation (identical in
any engine), the resulting integers sum exactly in any order, and the final
divide is a single deterministic fp op. The aggregation itself stays a
JVM-side codegen'd ``sum(long)`` — map-side partial aggregation, no shuffle
beyond the normal hash-agg exchange, no UDF.

This mirrors how production pipelines keep money columns exact (integer
cents), so it is the *right* 100-TB design, not just an oracle trick.

``DSUM_SQL`` / ``DAVG_SQL`` produce the equivalent ANSI SQL for the DuckDB
oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a double column snapped to ``scale`` decimal places."""
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.sum(F.round(c * m).cast("long")) / F.lit(m)


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-numerator average: (sum of snapped values / n) / 10^scale."""
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    s = F.sum(F.round(c * m).cast("long")).cast("double")
    return s / F.count(F.lit(1)) / F.lit(m)


def DSUM_SQL(expr: str, scale: int = 2) -> str:
    # CAST .. AS DOUBLE before dividing: DuckDB SUM(BIGINT) yields HUGEINT, and
    # a `/ 100.0` literal would be DECIMAL division — both diverge from Spark.
    m = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {m}) AS BIGINT)) AS DOUBLE) / {m}"


def DAVG_SQL(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {m}) AS BIGINT)) AS DOUBLE) / COUNT(*) / {m}"
