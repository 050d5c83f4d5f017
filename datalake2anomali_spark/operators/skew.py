"""Skew mitigation: salted two-phase aggregation and salted broadcast-side join.

AQE (enabled in session.py) already splits skewed *shuffle-join* partitions at
runtime; these helpers cover the two cases AQE does not:

- **salted_agg** — a hash aggregation where one group key holds a huge share
  of rows (the classic hot-key: one dataset_name with 90% of the IOCs, one
  null-ish user_id).  Phase 1 aggregates on (key, salt) so the hot key's rows
  spread over ``n_salts`` reducers; phase 2 merges the ≤ n_salts partials per
  key.  Correct for any algebraic aggregate expressed as (partial, merge)
  pair; results are identical to the unsalted groupBy (oracle-checked).
- **salted_join** — a large⋈large equi-join with a hot key on the probe side.
  The probe side gets a random-but-deterministic salt in [0, n_salts); the
  build side is replicated n_salts times with every salt value; joining on
  (key, salt) spreads the hot key across n_salts tasks.  Build-side rows
  multiply by n_salts, so use it when the build side is modest but too big to
  broadcast, and only the probe side skews — otherwise prefer AQE skew-join.

The salt must be *deterministic* (hash of a stable column, not ``rand()``):
retried tasks must salt a row identically or shuffle retries lose/duplicate
rows under speculative execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: Sequence[str], n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of stable columns."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    salt_from: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation that survives a hot group key.

    ``partials`` maps output column name → (phase-1 aggregate over raw rows,
    phase-2 aggregate over the phase-1 column of the same name).  E.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),      F.sum("n")),
            "s":   (F.sum("x"),             F.sum("s")),
            "mx":  (F.max("x"),             F.max("mx")),
        }, salt_from=["row_id"])

    Phase 1 shuffles on (keys, salt) — the hot key fans out n_salts-ways;
    phase 2 shuffles the tiny partial table on keys alone.  (This is exactly
    the partial/final split Spark's hash aggregate already does *within* a
    stage; salting extends it across the shuffle boundary where the planner
    can't.)
    """
    salted = with_salt(df, salt_from, n_salts)
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def partition_skew_stats(
    df: DataFrame, cols: Sequence[str], num_partitions: int = 32
) -> dict:
    """Diagnostic: row-count distribution over the hash partitions a shuffle
    on ``cols`` would produce — ``{"max": ..., "median": ..., "total": ...}``.

    The ``max`` is the stage's critical path on a real cluster: with fixed
    per-executor throughput, a shuffle stage finishes when its largest
    partition does, so max/median is the straggler factor a skewed key
    costs.  (On a single shared-CPU box wall-clock hides this — every core
    keeps working while the hot task runs — which is exactly why this
    measures the partition histogram instead of time.)  One pass: hash-
    partition, count per partition id, aggregate three numbers.
    """
    parts = (
        df.repartition(num_partitions, *[F.col(c) for c in cols])
        .select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = parts.agg(
        F.max("n"), F.expr("percentile(n, 0.5)"), F.sum("n")
    ).collect()[0]
    return {"max": int(row[0]), "median": float(row[1]), "total": int(row[2])}


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    salt_from: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads a hot probe-side key over ``n_salts`` tasks.

    The build side is exploded once per salt value (size × n_salts — keep it
    the smaller side); the probe side salts deterministically from
    ``salt_from`` columns.  Join keys become (keys..., __salt) and the salt
    is dropped from the result.

    Only probe-side-preserving joins are supported: replication means an
    *unmatched build row* appears once per salt, so right/full outer would
    emit n_salts duplicated null-extended rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports probe-side-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — the replicated build side would duplicate unmatched rows"
        )
    salted_probe = with_salt(probe, salt_from, n_salts)
    replicated = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_probe.join(replicated, [*keys, "__salt"], how).drop("__salt")
