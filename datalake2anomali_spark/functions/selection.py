"""Exact distributed quantiles without a global sort: two-pass selection.

``percentile_disc`` over 100 TB implies a global sort (or a single-node
collect); ``approx_percentile`` gives rank-error bounds, not answers.
This operator computes EXACT order statistics in two bounded aggregate
passes — the classic distributed-selection refinement:

1. **Coarse pass**: snap values to a scaled-integer grid (deterministic,
   see ``functions/exact.py``) and histogram them by high-order bits
   (``s >> coarse_bits``).  The histogram is one map-side-combined
   aggregate; its size is bounded by ``value_range / 2^coarse_bits``
   buckets, independent of row count.  The driver cumulative-sums the
   (sorted, small) histogram to locate, for every requested quantile, the
   bucket holding its target rank and the rank offset within it.
2. **Fine pass**: one filtered aggregate over ONLY the located buckets
   (the ``isin`` predicate pushes to the scan) counting exact values —
   at most ``2^coarse_bits`` distinct values per bucket, so driver state
   stays bounded.  The driver walks each bucket's value counts to the
   exact order statistic.

Both driver collects are provably bounded (bucket count / bucket width),
the same contract as the IVF trainer sample (``llm/similarity.py``).
Ranks use the ``quantile_disc`` convention: 1-indexed ascending rank
``max(1, ceil(q·n))`` — matched exactly by the oracle's ROW_NUMBER
formulation.  Arithmetic-shift bucketing preserves order for negative
values, so the walk is correct over any signed domain.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    scale: int = 2,
    coarse_bits: int = 16,
) -> DataFrame:
    """(q, value_scaled) rows: the exact ``max(1, ceil(q·n))``-th smallest
    snapped value per requested quantile.  NULLs are excluded (SQL
    aggregate convention); raises on an empty/all-NULL column."""
    spark = df.sparkSession
    snapped = df.select(
        F.round(F.col(col) * (10**scale)).cast("long").alias("s")
    ).filter(F.col("s").isNotNull())

    hist = sorted(
        (r.b, r.c)
        for r in snapped.groupBy(F.shiftright("s", coarse_bits).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sum(c for _, c in hist)
    if n == 0:
        raise ValueError(f"exact_quantiles: no non-NULL values in {col!r}")

    targets = {q: max(1, math.ceil(q * n)) for q in qs}
    # locate each target rank's bucket and intra-bucket rank
    locate: dict[float, tuple[int, int]] = {}
    for q, rank in targets.items():
        below = 0
        for b, c in hist:
            if rank <= below + c:
                locate[q] = (b, rank - below)
                break
            below += c
    buckets = sorted({b for b, _ in locate.values()})

    fine = {}
    rows = (
        snapped.filter(F.shiftright("s", coarse_bits).isin(buckets))
        .groupBy(F.shiftright("s", coarse_bits).alias("b"), "s")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    for r in rows:
        fine.setdefault(r.b, []).append((r.s, r.c))

    out = []
    for q, (b, intra) in locate.items():
        acc = 0
        for s, c in sorted(fine[b]):
            acc += c
            if intra <= acc:
                out.append((float(q), int(s)))
                break
    return spark.createDataFrame(
        sorted(out), "q double, value_scaled long"
    )
