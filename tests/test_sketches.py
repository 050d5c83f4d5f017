"""Sketch-aggregate tests (functions/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake2anomali_spark.functions.sketches import sketch_summary


def test_sketch_summary_bounds_hold(spark):
    # two groups: uniform values and a heavy-tailed group with ties
    rows = [("a", i % 37, float(i)) for i in range(1000)]
    rows += [("b", i % 11, float(i * i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, uid long, value double")
    out = {r.k: r for r in sketch_summary(df, "k", "uid", "value").collect()}
    assert out["a"].n_events == 1000 and out["a"].n_distinct_exact == 37
    assert out["b"].n_events == 500 and out["b"].n_distinct_exact == 11
    for k in ("a", "b"):
        assert out[k].hll_ok and out[k].p50_ok and out[k].p95_ok, out[k]


def test_sketch_summary_tiny_group(spark):
    # a 3-row group: rank slack (2 + 3%·n) must absorb discreteness
    df = spark.createDataFrame(
        [("t", 1, 1.0), ("t", 2, 100.0), ("t", 3, 10000.0)],
        "k string, uid long, value double",
    )
    r = sketch_summary(df, "k", "uid", "value").first()
    assert r.hll_ok and r.p50_ok and r.p95_ok


def test_exact_quantiles_known_values(spark):
    """100 distinct values 0.01..1.00: ceil-rank convention is directly
    checkable (p50 → rank 50 → 0.50; p95 → 0.95; p99 → 0.99; p100 → max;
    tiny q floors to rank 1 → min)."""
    from datalake2anomali_spark.functions.selection import exact_quantiles

    df = spark.createDataFrame([(i / 100.0,) for i in range(1, 101)], "v double")
    out = dict(
        (r.q, r.value_scaled)
        for r in exact_quantiles(df, "v", [0.001, 0.5, 0.95, 0.99, 1.0]).collect()
    )
    assert out == {0.001: 1, 0.5: 50, 0.95: 95, 0.99: 99, 1.0: 100}


def test_exact_quantiles_duplicates_negatives_and_nulls(spark):
    from datalake2anomali_spark.functions.selection import exact_quantiles

    rows = [(-5.0,)] * 10 + [(0.0,)] * 10 + [(7.25,)] * 10 + [(None,)] * 5
    df = spark.createDataFrame(rows, "v double")
    out = dict(
        (r.q, r.value_scaled)
        for r in exact_quantiles(df, "v", [0.2, 0.5, 0.9]).collect()
    )
    # n=30 non-null: rank 6 → -500; rank 15 → 0; rank 27 → 725
    assert out == {0.2: -500, 0.5: 0, 0.9: 725}


def test_exact_quantiles_spanning_bucket_boundary(spark):
    """Values straddling a 2^16 coarse-bucket edge: the walk must order
    buckets numerically (incl. the arithmetic-shift negative bucket)."""
    from datalake2anomali_spark.functions.selection import exact_quantiles

    vals = [-700.0, -1.0, 650.0, 660.0, 700.0]  # scaled: -70000, -100, 65000...
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = dict(
        (r.q, r.value_scaled) for r in exact_quantiles(df, "v", [0.2, 0.6, 1.0]).collect()
    )
    assert out == {0.2: -70000, 0.6: 65000, 1.0: 70000}


def test_exact_quantiles_empty_raises(spark):
    import pytest

    from datalake2anomali_spark.functions.selection import exact_quantiles

    df = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        exact_quantiles(df, "v", [0.5])


def test_cms_exactness_on_tiny_distinct_keys(spark):
    """With few distinct keys and a wide grid there are no collisions:
    estimates equal exact counts, and absent keys estimate 0 — both
    structural guarantees hold with zero slack consumed."""
    from datalake2anomali_spark.functions.sketches import cms_probe_summary

    df = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 30 + [3] * 1], "user_id long"
    )
    out = {r.key: r for r in cms_probe_summary(df, "user_id", [1, 2, 3, 99]).collect()}
    assert (out[1].exact_n, out[2].exact_n, out[3].exact_n, out[99].exact_n) == (50, 30, 1, 0)
    assert all(r.no_undercount and r.within_eps for r in out.values())


def test_cms_partitioning_invariance(spark):
    """Same multiset, adversarial repartitioning: the derived rows must be
    identical (CMS cell additions commute)."""
    from datalake2anomali_spark.functions.sketches import cms_probe_summary

    rows = [(k % 7,) for k in range(500)]
    a = spark.createDataFrame(rows, "user_id long")
    b = spark.createDataFrame(rows, "user_id long").repartition(13, "user_id")
    probes = list(range(9))
    ra = sorted(map(tuple, cms_probe_summary(a, "user_id", probes).collect()))
    rb = sorted(map(tuple, cms_probe_summary(b, "user_id", probes).collect()))
    assert ra == rb


def test_exact_quantiles_wide_domain_bounded(spark):
    """Epoch-microsecond-scale values (≈2^50 span): the shift must derive
    from observed min/max so every histogram stays ≤ 2^16 buckets — the
    round-5 version collected range/2^16 buckets (unbounded) here."""
    import math

    from datalake2anomali_spark.functions.selection import exact_quantiles

    base = 1_704_067_200_000_000  # 2024-01-01 in µs
    vals = [base + i * 7_919_333_123 for i in range(500)]  # ~4e12 span
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    qs = [0.01, 0.5, 0.99]
    got = {r.q: r.value_scaled for r in exact_quantiles(df, "v", qs, scale=0).collect()}
    snapped = sorted(round(v) for v in vals)
    for q in qs:
        rank = max(1, math.ceil(q * len(snapped)))
        assert got[q] == snapped[rank - 1], q


def test_exact_quantiles_wide_domain_with_negatives(spark):
    """Signed wide domain: arithmetic-shift bucketing must stay ordered
    across every refinement level, not just the coarse one."""
    import math

    from datalake2anomali_spark.functions.selection import exact_quantiles

    vals = [(-1) ** i * (i * 987_654_321 + i * i) for i in range(400)]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = {r.q: r.value_scaled for r in exact_quantiles(df, "v", qs, scale=0).collect()}
    snapped = sorted(round(v) for v in vals)
    for q in qs:
        rank = max(1, math.ceil(q * len(snapped)))
        assert got[q] == snapped[rank - 1], q


def _pcont_reference(vals, q, scale=2):
    """NumPy-style linear interpolation reference in exact integers."""
    s = sorted(round(v * 10**scale) for v in vals)
    n = len(s)
    p = round(q * 10**6)
    num = p * (n - 1)
    lo0, frac = num // 10**6, num % 10**6
    lo, hi = s[lo0], s[min(lo0 + 1, n - 1)]
    return lo, hi, frac, frac * (hi - lo)


def test_percentile_cont_matches_reference(spark):
    from datalake2anomali_spark.functions.selection import exact_percentile_cont

    vals = [1.07, 2.11, 2.11, 3.99, 10.5, -4.25, 0.0, 7.77]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        r.q: (r.lo_scaled, r.hi_scaled, r.frac_num, r.interp_rem)
        for r in exact_percentile_cont(df, "v", qs).collect()
    }
    for q in qs:
        assert got[q] == _pcont_reference(vals, q), q


def test_percentile_cont_wide_domain(spark):
    from datalake2anomali_spark.functions.selection import exact_percentile_cont

    base = 1_704_067_200_000_000
    vals = [float(base + i * 9_876_543_210) for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r.q: (r.lo_scaled, r.hi_scaled, r.frac_num, r.interp_rem)
        for r in exact_percentile_cont(df, "v", [0.5, 0.999], scale=0).collect()
    }
    for q in (0.5, 0.999):
        assert got[q] == _pcont_reference(vals, q, scale=0), q


def test_order_statistics_rank_bounds(spark):
    import pytest

    from datalake2anomali_spark.functions.selection import order_statistics

    df = spark.createDataFrame([(1,), (2,)], "s long")
    with pytest.raises(ValueError, match="out of"):
        order_statistics(df, [0])
    with pytest.raises(ValueError, match="out of"):
        order_statistics(df, [3])
    assert order_statistics(df, [1, 2]) == {1: 1, 2: 2}


def test_equi_depth_histogram_known_and_duplicates(spark):
    from datalake2anomali_spark.functions.selection import equi_depth_histogram

    # 1..100 ×0.01, 4 bins: edges 0.25/0.50/0.75/1.00, 25 rows each
    df = spark.createDataFrame([(i / 100.0,) for i in range(1, 101)], "v double")
    rows = {r.bin: (r.hi_scaled, r.cum_rows, r.n_rows)
            for r in equi_depth_histogram(df, "v", 4).collect()}
    assert rows == {1: (25, 25, 25), 2: (50, 50, 25),
                    3: (75, 75, 25), 4: (100, 100, 25)}

    # a 90%-duplicate run: the dup value swallows earlier bins, which must
    # report their true (possibly zero) mass, not a smoothed lie
    dup = spark.createDataFrame(
        [(1.0,)] * 90 + [(float(2 + i),) for i in range(10)], "v double"
    )
    rows = {r.bin: (r.hi_scaled, r.cum_rows, r.n_rows)
            for r in equi_depth_histogram(dup, "v", 4).collect()}
    assert rows[1] == (100, 90, 90)   # edge at the dup, true cum mass
    assert rows[2] == (100, 90, 0)    # swallowed bin reports zero
    assert rows[4][1] == 100
    assert sum(v[2] for v in rows.values()) == 100


def test_groupwise_percentile_cont_hand_values(spark):
    """Hand-computed interpolation per group, including a 1-row group
    (lo == hi, frac irrelevant, interp_rem 0 when bracketing collapses)."""
    from datalake2anomali_spark.functions.selection import (
        groupwise_percentile_cont,
    )

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r.g, r.q): (r.lo_scaled, r.hi_scaled, r.frac_num, r.interp_rem)
        for r in groupwise_percentile_cont(df, ["g"], "x", [0.5, 0.25]).collect()
    }
    # group a (snapped: 100,200,300,400), n=4:
    #   q=0.5 : h = 0.5*3 = 1.5  -> r_lo=2 (200), r_hi=3 (300), frac=500000
    #   q=0.25: h = 0.75         -> r_lo=1 (100), r_hi=2 (200), frac=750000
    assert out[("a", 0.5)] == (200, 300, 500_000, 500_000 * 100)
    assert out[("a", 0.25)] == (100, 200, 750_000, 750_000 * 100)
    # group b: single row, both brackets collapse to it
    assert out[("b", 0.5)] == (1000, 1000, 0, 0)
    assert out[("b", 0.25)] == (1000, 1000, 0, 0)
