"""Global row numbering without the single-partition window.

``ROW_NUMBER() OVER (ORDER BY …)`` with no PARTITION BY is the classic
Spark scale-killer: the whole relation funnels through ONE task for the
global sort.  The distributed rewrite is textbook two-phase ranking:

1. **Range partition + local sort.** ``repartitionByRange(order_cols)``
   gives disjoint, globally ordered partition ranges (one shuffle — the
   same exchange a global sort pays, but into N parallel partitions);
   ``sortWithinPartitions`` orders within each.
2. **Partition offsets.** One map-side-combined aggregate counts rows per
   ``spark_partition_id()``; the driver prefix-sums the (≤ N-partition)
   histogram into start offsets — bounded driver state, same contract as
   ``functions/selection.py``.
3. **Local numbering + offset.** A single ``mapInPandas`` pass assigns
   ``offset[pid] + local_index`` — Arrow-batched, zero additional
   shuffle, no Python loop over rows (one ``np.arange`` per batch).
   Batches arrive in partition order, so the running counter per
   partition is exact.

Total: ONE shuffle + one tiny aggregate, fully parallel — versus the
built-in plan's single-task sort.  Requires ``order_cols`` to be a unique
key (ties would make numbering nondeterministic across retries; the
caller supplies the tiebreaker, as everywhere else in this repo).

Reference parity: none — extension operator (the export/ranking primitive
every training-data pipeline needs for stable sharding and pagination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus a ``rn`` column: the exact 1-based global rank in the
    total order of ``order_cols`` (which must be a unique key) — computed
    with range partitioning + per-partition offsets, never a one-task
    global sort."""
    import numpy as np  # noqa: F401  (documents the mapInPandas dependency)

    cols = [F.col(c) for c in order_cols]
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # materialize the ranged relation: the offsets pass and the numbering
    # pass must see the SAME partitioning, and the count pass forces full
    # computation anyway — checkpointing buys consistency and skips a
    # second sort (distributed executor storage, never driver-side)
    ranged = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint(eager=True)
    )

    counts = {
        r["pid"]: r["c"]
        for r in ranged.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("rn", T.LongType())]
    )

    def _number(iterator):
        import numpy as np
        from pyspark import TaskContext

        start = offsets.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for batch in iterator:
            batch = batch.copy()
            batch["rn"] = np.arange(
                start + seen + 1, start + seen + 1 + len(batch), dtype="int64"
            )
            seen += len(batch)
            yield batch

    return ranged.mapInPandas(_number, schema)
