"""Mergeable sketch aggregates: HLL distinct counts + approximate quantiles.

At 100 TB, exact ``COUNT(DISTINCT)`` shuffles every distinct key and an
exact percentile sorts each group; the scale path is the mergeable sketch —
HyperLogLog++ for cardinality (``approx_count_distinct``) and a quantile
summary for percentiles (``percentile_approx``).  Both aggregate in one
map-side partial + small fixed-size merge, so cost is O(input) with
constant-size shuffle rows regardless of cardinality.

Determinism notes (what makes these oracle-checkable as *bounds*):

- HLL++ is hash-based with no RNG and merges by bitwise max — the estimate
  is a pure function of the input set, independent of partitioning.
- The quantile summary's guarantee is a RANK bound, not a value bound: the
  returned element's rank is within eps·n of the target (eps = 1/accuracy,
  plus merge slack).  A value-space tolerance breaks on sparse tails and
  tiny groups, so the check below verifies the actual contract — it counts
  how many of the group's values fall at or below the sketch's percentile
  and asserts that rank lands within the bound.

``sketch_summary`` returns per-group exact anchors (row count, exact
distinct — feasible at test scale) alongside booleans asserting each sketch
meets its bound; the DuckDB oracle recomputes the anchors and pins the
booleans TRUE (same derived-check scheme as the LSH/IVF operators in
``plans/llm_queries.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_summary(
    df: DataFrame,
    key: str,
    id_col: str,
    value_col: str,
    rsd: float = 0.05,
    accuracy: int = 10000,
    rel_card_bound: float = 0.15,
    rank_frac_bound: float = 0.03,
) -> DataFrame:
    """Per-``key`` sketch-vs-exact summary.

    Output: (key, n_events, n_distinct_exact, hll_ok, p50_ok, p95_ok) —
    ``hll_ok`` bounds the HLL++ relative error at ``rel_card_bound`` (3×
    the requested rsd by default); ``p50_ok`` / ``p95_ok`` assert the
    rank-error contract: |rank(sketch_p) − p·n| ≤ ``rank_frac_bound``·n + 2
    (loose vs eps = 1/accuracy, so partition-order merge variation can
    never flip them).

    Plan shape: one grouped agg builds the sketches, the tiny per-key
    result broadcasts back onto the input to count ranks (second pass over
    the data, map-side agg) — the verification costs one extra scan, never
    a sort.

    The rank check assumes a mostly-distinct value column (true of any
    continuous measure): under massive ties "the rank of a value" spans the
    whole tie run, so a near-constant group can overshoot the bound even
    though the sketch answered correctly.  ``n_events`` counts non-null
    ``value_col`` rows (matching what the quantile sketch and rank probe
    see); an all-NULL group yields n_events = 0 and vacuously-true bounds.
    """
    # The per-key aggregate subplan is referenced twice (broadcast
    # rank-probe + final join) and is deliberately NOT persisted: caching
    # the aggregate measured 5× slower end-to-end than recomputing it (the
    # InMemoryRelation materialization serializes what is otherwise a fully
    # pipelined pair of scans).
    agg = df.groupBy(key).agg(
        # count(value_col), not count(*): the rank probe and
        # percentile_approx both ignore NULL values, so n_events must be the
        # non-null row count or NULL-bearing groups deflate the measured
        # rank and spuriously fail p50_ok/p95_ok.
        F.count(F.col(value_col)).alias("n_events"),
        F.countDistinct(id_col).alias("n_distinct_exact"),
        F.approx_count_distinct(id_col, rsd).alias("hll"),
        F.percentile_approx(
            value_col, F.array(F.lit(0.5), F.lit(0.95)), F.lit(accuracy)
        ).alias("qa"),
    )
    ranks = (
        df.select(key, value_col)
        .join(F.broadcast(agg.select(key, "qa")), key)
        .groupBy(key)
        .agg(
            F.sum((F.col(value_col) <= F.col("qa")[0]).cast("long")).alias("n_le_p50"),
            F.sum((F.col(value_col) <= F.col("qa")[1]).cast("long")).alias("n_le_p95"),
        )
    )
    slack = rank_frac_bound * F.col("n_events") + 2
    return agg.join(ranks, key).select(
        key,
        "n_events",
        "n_distinct_exact",
        (
            F.abs(F.col("hll") - F.col("n_distinct_exact"))
            <= rel_card_bound * F.col("n_distinct_exact")
        ).alias("hll_ok"),
        F.when(F.col("n_events") == 0, F.lit(True))
        .otherwise(F.abs(F.col("n_le_p50") - 0.5 * F.col("n_events")) <= slack)
        .alias("p50_ok"),
        F.when(F.col("n_events") == 0, F.lit(True))
        .otherwise(F.abs(F.col("n_le_p95") - 0.95 * F.col("n_events")) <= slack)
        .alias("p95_ok"),
    )


def cms_probe_summary(
    df: DataFrame,
    col: str,
    probes: list[int],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count–Min sketch point-frequency estimates vs exact anchors.

    The CMS is the mergeable frequency sketch: fixed ``d×w`` counter grid
    (d = ln(1/δ) rows, w = e/ε columns), map-side partials merged by
    cell-wise addition — O(1) shuffle rows per partition regardless of key
    cardinality, the scale path when :func:`..heavy.heavy_hitters`' exact
    two-pass is too much and only point lookups are needed.  With a fixed
    seed the estimate is a pure function of the input *multiset* (counter
    additions commute), so the derived checks below are deterministic
    under any partitioning.

    Output, one row per probe key: ``(key, exact_n, no_undercount,
    within_eps)`` — CMS never undercounts (every row of the grid saw every
    occurrence), and overcounts by at most ``ε·N`` with probability
    ``1−δ``; the registered probe set keeps both checks structural
    (absent keys included: their estimate is pure collision noise, still
    bounded).  Exact anchors cost one filtered aggregate over the probe
    set; the sketch itself is Spark's built-in ``df.stat.countMinSketch``
    (JVM aggregate, one pass).  Same derived-check oracle scheme as
    :func:`sketch_summary`.
    """
    import math

    spark = df.sparkSession
    # count(col), not count(*): the sketch aggregate skips NULLs, so the
    # ε·N slack must use the item count the sketch actually ingested — an
    # all-rows N would loosen the documented CMS guarantee on NULL-bearing
    # columns (ADVICE r5)
    n_total = df.agg(F.count(F.col(col)).alias("n")).collect()[0]["n"]
    # F.count_min_sketch is the aggregate (one pass, cell-wise mergeable);
    # Spark 4 exposes no SQL-side point estimator, so deserialize the
    # sketch's binary form through the JVM sketch class for the probes —
    # a driver-side decode of a fixed d×w grid, not a data collect.
    sk_bytes = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk_bytes))
    )
    exact = {
        r["k"]: r["n"]
        for r in df.filter(F.col(col).isin(probes))
        .groupBy(F.col(col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    slack = math.ceil(eps * n_total)
    rows = []
    for p in probes:
        # box explicitly as java.lang.Long: py4j would send a small python
        # int as Integer, which the sketch hashes differently than the
        # LongType column it aggregated
        est = sk.estimateCount(jvm.java.lang.Long.parseLong(str(int(p))))
        true_n = int(exact.get(p, 0))
        rows.append(
            (int(p), true_n, bool(est >= true_n), bool(est <= true_n + slack))
        )
    return spark.createDataFrame(
        sorted(rows), "key long, exact_n long, no_undercount boolean, within_eps boolean"
    )
