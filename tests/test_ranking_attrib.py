"""Global row numbering (operators/ranking.py) + multi-touch attribution
(operators/analytics.py: attribution_credit)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datalake2anomali_spark.operators.analytics import attribution_credit
from datalake2anomali_spark.operators.ranking import global_row_numbers


def test_global_row_numbers_exact_and_gapless(spark):
    rng = random.Random(3)
    keys = list(range(1, 2001))
    rng.shuffle(keys)
    df = spark.createDataFrame([(k, k * 2) for k in keys], "k long, v long")
    out = global_row_numbers(df, ["k"], n_partitions=7).collect()
    assert len(out) == 2000
    by_rank = {r.rn: r.k for r in out}
    assert sorted(by_rank) == list(range(1, 2001))  # gapless, no overlap
    assert [by_rank[i] for i in range(1, 2001)] == sorted(keys)  # exact order


def test_global_row_numbers_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k long")
    out = {r.k: r.rn for r in global_row_numbers(df, ["k"], 16).collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def _attr(spark, rows):
    """rows: (user, ts_s, type, eid)"""
    df = spark.createDataFrame(
        [(u, t * 1_000_000, ty, e) for u, t, ty, e in rows],
        "user_id long, ts_us long, event_type string, event_id long",
    ).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"), "event_type", "event_id"
    )
    return {
        r.channel: (r.n_touches, r.credit_ppm_sum)
        for r in attribution_credit(df).collect()
    }


def test_attribution_single_and_double_touch(spark):
    got = _attr(
        spark,
        [
            (1, 10, "view", 1), (1, 20, "purchase", 2),      # n=1 → 1_000_000
            (2, 10, "view", 3), (2, 15, "click", 4), (2, 20, "purchase", 5),
        ],
    )
    # user2: n=2 → 500k each
    assert got["view"] == (2, 1_000_000 + 500_000)
    assert got["click"] == (1, 500_000)


def test_attribution_u_shape_and_remainder(spark):
    # n=5: first/last 400k, middles 200000 div 3 = 66666, remainder 2 → r=2
    rows = [(1, t, ty, i) for i, (t, ty) in enumerate(
        [(10, "view"), (20, "click"), (30, "view"), (40, "click"),
         (50, "view"), (60, "purchase")]
    )]
    got = _attr(spark, rows)
    # positions: r1 view 400000, r2 click 66668, r3 view 66666,
    # r4 click 66666, r5 view 400000
    assert got["view"] == (3, 400_000 + 66_666 + 400_000)
    assert got["click"] == (2, 66_668 + 66_666)
    assert sum(v for _, v in got.values()) == 1_000_000


def test_attribution_trailing_touches_excluded_and_groups_split(spark):
    rows = [
        (1, 10, "view", 1), (1, 20, "purchase", 2),   # journey 1: n=1
        (1, 30, "click", 3), (1, 40, "purchase", 4),  # journey 2: n=1
        (1, 50, "view", 5),                           # trailing — no credit
    ]
    got = _attr(spark, rows)
    assert got["view"] == (1, 1_000_000)
    assert got["click"] == (1, 1_000_000)
