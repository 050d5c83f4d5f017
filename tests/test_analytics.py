"""Edge-semantics tests for operators/analytics.py (funnel, cohort, EWMA).

The sf0.01 oracle run checks bulk agreement with DuckDB; these pin the
boundary behaviors on handmade rows: funnel strictness at equal
timestamps, out-of-order step events, cohort week boundaries, EWMA depth
truncation and exact dyadic arithmetic — plus the one-exchange plan shape
the operator's scale story depends on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake2anomali_spark.operators import analytics

US = 1_000_000


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")


def test_funnel_strict_order_and_equal_ts(spark):
    ev = _events(
        spark,
        [
            # user 1: click BEFORE view never counts; later click does
            (1, 1, 10 * US, "click", 0.0),
            (2, 1, 20 * US, "view", 0.0),
            (3, 1, 20 * US, "click", 0.0),  # equal ts to view: strict > rejects
            (4, 1, 30 * US, "click", 0.0),
            (5, 1, 25 * US, "purchase", 0.0),  # before the qualifying click
            (6, 1, 40 * US, "purchase", 0.0),
            # user 2: full funnel in order
            (7, 2, 1 * US, "view", 0.0),
            (8, 2, 2 * US, "click", 0.0),
            (9, 2, 3 * US, "purchase", 0.0),
            # user 3: never views
            (10, 3, 5 * US, "click", 0.0),
        ],
    )
    out = {
        r.entity: r
        for r in analytics.funnel_steps(ev, ("view", "click", "purchase")).collect()
    }
    assert out[1].step1_us == 20 * US
    assert out[1].step2_us == 30 * US  # not the equal-ts click at 20s
    assert out[1].step3_us == 40 * US  # not the 25s purchase before the click
    assert out[1].steps_completed == 3
    assert (out[2].step1_us, out[2].step2_us, out[2].step3_us) == (1 * US, 2 * US, 3 * US)
    assert out[3].step1_us is None and out[3].steps_completed == 0


def test_funnel_single_exchange_plan(spark):
    ev = _events(spark, [(1, 1, US, "view", 0.0)])
    plan = (
        analytics.funnel_steps(ev, ("view", "click", "purchase"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # running-min windows + final agg must share ONE hash exchange on the
    # entity key (AQE may add nothing else for this local relation)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cohort_retention_week_boundaries(spark):
    wk = analytics.WEEK_US
    ev = _events(
        spark,
        [
            (1, 1, 0, "view", 0.0),  # cohort week 0
            (2, 1, wk - 1, "view", 0.0),  # still week 0
            (3, 1, wk, "view", 0.0),  # exactly week 1
            (4, 1, 3 * wk + 5, "view", 0.0),  # week 3 (week 2 skipped)
            (5, 2, 2 * wk, "view", 0.0),  # user 2 cohorts in week 2
        ],
    )
    cells = {
        (r.cohort_week, r.week_offset): r.active_entities
        for r in analytics.cohort_retention(ev).collect()
    }
    assert cells == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (2, 0): 1}


def test_ewma_exact_fold_and_depth_truncation(spark):
    # values 1.0 at every event: scaled 1000 each; fold acc' = x + acc>>1
    # floor-halved chain: 1000, 1500, 1750, 1875, 1937, ... → 1998 at depth 10
    rows = [(i, 1, i * US, "view", 1.0) for i in range(1, 16)]
    ev = _events(spark, rows)
    out = {r.event_id: r.ewma_scaled for r in analytics.ewma_features(ev).collect()}
    assert out[1] == 1000
    assert out[2] == 1500
    assert out[3] == 1750
    # depth-10 window: every event from the 10th on sees the same full frame
    assert out[10] == out[15] == 1998  # Σ floor-halved chain, exact
    # recompute the expected chain in python ints to pin the arithmetic
    acc = 0
    for _ in range(10):
        acc = 1000 + (acc >> 1)
    assert out[10] == acc


def test_ewma_decay_prefers_recent(spark):
    ev = _events(
        spark,
        [(1, 1, 1 * US, "view", 100.0), (2, 1, 2 * US, "view", 0.0)],
    )
    out = {r.event_id: r.ewma_scaled for r in analytics.ewma_features(ev).collect()}
    assert out[1] == 100_000
    assert out[2] == 50_000  # old value halved, new value dominates


def test_markov_transitions_exact_ppm(spark):
    ev = _events(
        spark,
        [
            # user 1: a -> b -> a -> c ; user 2: b -> a
            (1, 1, 1 * US, "a", 0.0),
            (2, 1, 2 * US, "b", 0.0),
            (3, 1, 3 * US, "a", 0.0),
            (4, 1, 4 * US, "c", 0.0),
            (5, 2, 1 * US, "b", 0.0),
            (6, 2, 2 * US, "a", 0.0),
        ],
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.p_ppm)
        for r in analytics.markov_transitions(ev).collect()
    }
    # from 'a': b once, c once → 500000 ppm each; from 'b': a twice → 1000000
    assert out == {
        ("a", "b"): (1, 500_000),
        ("a", "c"): (1, 500_000),
        ("b", "a"): (2, 1_000_000),
    }


def test_markov_transitions_no_cross_user_leak(spark):
    # last event of user 1 must NOT chain into first event of user 2
    ev = _events(spark, [(1, 1, 1 * US, "x", 0.0), (2, 2, 2 * US, "y", 0.0)])
    assert analytics.markov_transitions(ev).count() == 0


def test_robust_outliers_flags_spike_not_regime_change(spark):
    # stable stream at 10.0 with one spike: spike flagged; after a genuine
    # regime change the window median adapts and stops flagging
    vals = [10.0] * 5 + [500.0] + [10.0] * 3
    rows = [(i, 1, i * US, "v", v) for i, v in enumerate(vals, 1)]
    ev = _events(spark, rows)
    out = {r.event_id: r for r in analytics.robust_outliers(ev, depth=5).collect()}
    assert out[6].is_outlier  # the spike
    assert not any(out[i].is_outlier for i in (1, 2, 3, 4, 5, 8, 9))
    assert out[5].median_scaled == 10_000 and out[5].mad_scaled == 0


def test_robust_outliers_mad_zero_means_any_deviation_flags(spark):
    # constant history → MAD 0 → ANY deviation exceeds 5*0 (Hampel edge)
    rows = [(1, 1, 1 * US, "v", 7.0), (2, 1, 2 * US, "v", 7.0),
            (3, 1, 3 * US, "v", 7.001)]
    ev = _events(spark, rows)
    out = {r.event_id: r.is_outlier for r in analytics.robust_outliers(ev).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_cooccurrence_similarity_exact_and_capped(spark):
    df = spark.createDataFrame(
        # items 1,2 co-occur in 2 of their baskets; item 3 only with 1
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (10, 1)],
        "b long, i long",
    )
    out = {
        (r.item_a, r.item_b): (r.n_pair, r.cosine)
        for r in analytics.cooccurrence_similarity(df, "b", "i", min_pair_support=1).collect()
    }
    # c_1=3 baskets, c_2=2, c_12=2 → 2/sqrt(6)
    assert out[(1, 2)] == (2, round(2 / (6 ** 0.5), 6))
    assert out[(1, 3)] == (1, round(1 / (3 ** 0.5), 6))
    # support filter drops the singleton pair
    sup2 = analytics.cooccurrence_similarity(df, "b", "i", min_pair_support=2)
    assert {(r.item_a, r.item_b) for r in sup2.collect()} == {(1, 2)}
    # basket cap drops oversized baskets wholesale
    big = spark.createDataFrame([(1, i) for i in range(5)], "b long, i long")
    assert analytics.cooccurrence_similarity(big, "b", "i", 1, max_basket=4).count() == 0
