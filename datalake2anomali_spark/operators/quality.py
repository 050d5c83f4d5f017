"""Data-quality constraint audit + snapshot diff (reconciliation) operators.

A 100 TB ingest pipeline gates every batch on declarative quality
constraints (the Deequ / dbt-test pattern) and reconciles snapshots after
copy-on-write rewrites (:mod:`.merge`).  Neither exists in the reference
connector (682-LoC REST client, ``src/Datalake2Anomali.py``) — both belong
to the pipeline extension surface the build brief mandates.

Scale design:

- :func:`audit` compiles the whole constraint suite to **one aggregate
  job** over the fact table: completeness, range, accepted-values, and
  uniqueness checks all become columns of a single ``agg`` (Catalyst plans
  the mixed distinct/non-distinct aggregate with one Expand + two-phase
  hash agg — still a single scan, map-side partials, ~1-row shuffle), then
  a driver-free unpivot turns the 1-row result into one row per
  constraint.  Each foreign-key constraint adds one left-anti join count
  (shuffled on the key, broadcast when the dimension is small) unioned in.
  The naive formulation — one pass per constraint — scans the fact table
  N times; this scans it once plus once per FK.
- :func:`snapshot_diff` is one null-safe full-outer join on the key
  (co-partitioned single shuffle; with bucketed snapshots, zero exchange
  — see ``io/bucketing.py``), classifying every key as
  added/removed/changed and naming the changed columns row-locally.
  Unchanged rows are dropped *before* the join output materializes
  anything wide downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative constraint; compiled by :func:`audit`.

    ``kind`` ∈ {non_null, unique, in_range, accepted}; FK checks are
    passed separately (they need a second table).  ``passed`` semantics:
    non_null/unique → observed == expected (row count); in_range/accepted
    → observed violations == 0.
    """

    kind: str
    cols: tuple[str, ...]
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default=())

    @property
    def name(self) -> str:
        base = f"{self.kind}:{','.join(self.cols)}"
        if self.kind == "in_range":
            return f"{base}:[{self.lo},{self.hi}]"
        return base


def non_null(*cols: str) -> Check:
    return Check("non_null", cols)


def unique(*cols: str) -> Check:
    return Check("unique", cols)


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check("in_range", (col,), lo=lo, hi=hi)


def accepted(col: str, *values) -> Check:
    return Check("accepted", (col,), values=tuple(values))


def audit(
    df: DataFrame,
    checks: list[Check],
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run a constraint suite; one row per constraint:
    ``(check_name, observed, expected, passed)``.

    ``foreign_keys``: (fact_col, dim_df, dim_col) triples; ``observed`` is
    the count of fact rows whose key has no match in the dimension
    (NULL fact keys count as orphans — a NULL FK is a missing reference).
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in checks:
        if c.kind == "non_null":
            expr = F.count(F.col(c.cols[0]))
        elif c.kind == "unique":
            # distinct over a null-safe struct, NOT countDistinct(cols):
            # the latter drops any row with a NULL key column, which both
            # diverges from the oracle's COUNT(DISTINCT (a,b)) row-struct
            # semantics and fails uniqueness on tables whose distinct
            # tuples merely contain NULLs (ADVICE r5).  The struct itself
            # is never NULL, so every row counts; NULL keys compare equal
            # within it (GROUP BY semantics) — duplicate NULL-keyed tuples
            # still lower the count, as they should.
            expr = F.countDistinct(F.struct(*[F.col(x) for x in c.cols]))
        elif c.kind == "in_range":
            col = F.col(c.cols[0])
            expr = F.sum(
                F.when(col.isNull() | (col < c.lo) | (col > c.hi), 1).otherwise(0)
            )
        elif c.kind == "accepted":
            col = F.col(c.cols[0])
            expr = F.sum(F.when(col.isin(*c.values), 0).otherwise(1))
        else:
            raise ValueError(f"unknown check kind: {c.kind!r}")
        aggs.append(expr.cast("long").alias(c.name))
    one = df.agg(*aggs)

    # unpivot via a single inline(array(struct...)) projection: a UNION of
    # per-constraint selects would duplicate the whole agg subtree (and its
    # scan) once per branch — Catalyst does not common-subexpression unions
    structs = []
    for c in checks:
        observed = F.col(f"`{c.name}`")
        if c.kind in ("non_null", "unique"):
            expected = F.col("_total")
        else:
            expected = F.lit(0).cast("long")
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                observed.alias("observed"),
                expected.alias("expected"),
                (observed == expected).alias("passed"),
            )
        )
    out = one.select(F.inline(F.array(*structs)))

    for fact_col, dim_df, dim_col in foreign_keys or []:
        orphans = (
            df.select(F.col(fact_col))
            .join(
                dim_df.select(F.col(dim_col).alias(fact_col)), fact_col, "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("long").alias("observed"))
            .select(
                F.lit(f"foreign_key:{fact_col}").alias("check_name"),
                "observed",
                F.lit(0).cast("long").alias("expected"),
                (F.col("observed") == 0).alias("passed"),
            )
        )
        out = out.unionByName(orphans)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    include_images: bool = False,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table.

    Output: key columns + ``change_type`` ∈ {added, removed, changed} +
    ``changed_cols`` (comma-joined names, deterministic column order;
    empty for added/removed).  Unchanged keys are filtered out before
    anything widens.  Comparison is null-safe per column (NULL == NULL is
    *unchanged*), so schema-identical snapshots diff exactly.

    ``include_images=True`` additionally carries the before/after row
    payloads as ``pre_<c>`` / ``post_<c>`` per non-key column (Delta
    CDF's update_preimage/postimage shape) — what a retraction-based
    consumer (``operators/views.py: apply_changes``) needs to subtract
    the old contribution and add the new one.
    """
    compare = [c for c in old.columns if c not in keys]
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns} "
            "(align with io/evolution.py first)"
        )
    # presence flags must survive all-NULL payloads: a literal marker per
    # side, not payload nullability
    o = old.select(
        *keys, F.lit(True).alias("_in_old"), *[F.col(c).alias(f"_o_{c}") for c in compare]
    )
    n = new.select(
        *keys, F.lit(True).alias("_in_new"), *[F.col(c).alias(f"_n_{c}") for c in compare]
    )
    j = o.join(n, keys, "full_outer")
    diff_flags = [
        (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).alias(f"_d_{c}")
        for c in compare
    ]
    j = j.select("*", *diff_flags)
    any_diff = reduce(lambda a, b: a | b, [F.col(f"_d_{c}") for c in compare], F.lit(False))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    changed_cols = F.concat_ws(
        ",", *[F.when(F.col(f"_d_{c}"), F.lit(c)) for c in compare]
    )
    image_cols = (
        [F.col(f"_o_{c}").alias(f"pre_{c}") for c in compare]
        + [F.col(f"_n_{c}").alias(f"post_{c}") for c in compare]
        if include_images
        else []
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(F.col("change_type") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
            *image_cols,
        )
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Privacy-audit report over the quasi-identifier equivalence classes:
    one row ``(n_classes, n_violating_classes, n_rows_at_risk,
    min_class_size)`` — a dataset is k-anonymous iff no class is smaller
    than ``k`` (Sweeney 2002); training-data releases run exactly this
    gate before publishing joined user-adjacent tables.

    One groupBy on the quasi columns (NULL quasi values form their own
    class, GROUP BY semantics — matching the oracle) + one tiny aggregate
    over the class-size relation; nothing row-scale leaves the first
    map-side-combined exchange.
    """
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    small = F.col("_n") < k
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(small.cast("long")).alias("n_violating_classes"),
        F.sum(F.when(small, F.col("_n")).otherwise(0)).cast("long").alias(
            "n_rows_at_risk"
        ),
        F.min("_n").cast("long").alias("min_class_size"),
    )
