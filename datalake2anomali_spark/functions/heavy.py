"""Exact distributed heavy hitters (frequent items) in two passes.

At 100 TB an exact ``GROUP BY value`` shuffles every distinct key — if the
column is high-cardinality (user ids, URLs, file hashes) the shuffle *is*
the job.  But the heavy-hitter question ("which values exceed a 1/m share
of the data?") doesn't need the full histogram, and the classic two-pass
scheme answers it exactly with a shuffle proportional to the *answer*, not
the key space:

1. **Local-candidate pass (map-only).** Each partition counts its own rows
   exactly (a per-partition hash aggregation inside ``mapInPandas`` — no
   shuffle) and emits only values whose *local* share exceeds 1/m.  By
   pigeonhole, any value with global count > n/m must hold a local share
   > 1/m in at least one partition, so the union of local candidates is a
   guaranteed superset of the true heavy hitters.  At most m−1 values per
   partition can clear the local bar, so the candidate set is bounded by
   (m−1)·P regardless of the column's cardinality.
2. **Exact recount pass.** Broadcast-semi-join the candidate set back onto
   the data and count only those values exactly; filter to the global
   threshold ``count·m > n``.  The shuffle carries at most (m−1)·P rows.

This mirrors the Misra-Gries → recount construction (Misra & Gries 1982;
the candidate bound is the standard local-share pigeonhole argument) and is
exact — unlike a one-pass sketch there is no count error, which is what
makes it oracle-checkable against ``GROUP BY ... HAVING count(*)*m > n``.

Reference parity note: the reference computes only whole-input aggregates
(max threat score, ``src/Datalake2Anomali.py:83``); this generalizes its
aggregate surface to frequency analysis at scale, per the driver's
extension mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_heavy_candidates(df: DataFrame, value_col: str, m: int) -> DataFrame:
    """Map-only pass: values whose share of any one partition exceeds 1/m.

    Exact per-partition counting via pandas ``value_counts`` accumulated
    across the partition's Arrow batches; emits the (small) candidate list
    per partition, deduplicated downstream.  Guaranteed superset of global
    heavy hitters (pigeonhole over partitions).
    """
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    field = df.schema[value_col]
    narrow = df.select(value_col)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        local_n = 0
        dtype = None
        for pdf in batches:
            local_n += len(pdf)
            dtype = pdf[value_col].dtype
            vc = pdf[value_col].value_counts(dropna=True)
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
        if local_n:
            cands = [v for v, c in counts.items() if c * m > local_n]
            yield pd.DataFrame({value_col: pd.Series(cands, dtype=dtype)})

    return narrow.mapInPandas(emit, schema=f"`{value_col}` {field.dataType.simpleString()}").distinct()


def heavy_hitters(df: DataFrame, value_col: str, m: int) -> DataFrame:
    """Exact values with global count strictly above n/m, with their counts.

    Columns: ``value_col``, ``cnt`` — ordered by cnt desc then value.  The
    plan is two scans + one candidate-bounded shuffle; no full-histogram
    exchange at any scale.
    """
    cands = local_heavy_candidates(df, value_col, m)
    total = df.agg(F.count(F.lit(1)).alias("total_n"))
    counted = (
        df.join(F.broadcast(cands), on=value_col, how="leftsemi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(m) > F.col("total_n"))
        .select(value_col, "cnt")
        .orderBy(F.desc("cnt"), F.asc(value_col))
    )
