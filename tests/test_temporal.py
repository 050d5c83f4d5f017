"""Edge-semantics tests for operators/temporal.py (as-of, range join, rollup).

The sf0.01 oracle run checks bulk agreement with DuckDB; these pin the
boundary behaviors on handmade rows: tie inclusivity, no-match nulls,
interval endpoint inclusivity, bucket-boundary candidates, and fixed-point
exactness through the rollup chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake2anomali_spark.operators import temporal

US = 1_000_000


def _ts_df(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")


def test_asof_join_tie_and_no_match(spark):
    left = _ts_df(
        spark,
        [(1, 10, 100 * US), (2, 10, 50 * US), (3, 20, 500 * US)],
        "event_id long, user_id long, ts_us long",
    )
    right = _ts_df(
        spark,
        [(91, 10, 100 * US), (92, 10, 60 * US), (93, 10, 40 * US)],
        "rid long, user_id long, ts_us long",
    )
    out = {
        r.event_id: r
        for r in temporal.asof_join(left, right, keys=["user_id"], ts_col="ts").collect()
    }
    assert out[1].rid_r == 91  # equal timestamps match (inclusive <=)
    assert out[2].rid_r == 93  # picks 40s, not 60s (newest at-or-before 50s)
    assert out[3].rid_r is None and out[3].ts_r is None  # user 20: left-join nulls


def test_asof_join_null_payload_not_mixed_across_rows(spark):
    # The newest right row has a NULL payload column; every output field must
    # still come from THAT row — a per-column last(ignorenulls) would backfill
    # just the NULL column from the older row, splicing two right rows.
    left = _ts_df(spark, [(1, 10, 100 * US)], "event_id long, user_id long, ts_us long")
    right = _ts_df(
        spark,
        [(91, "old-a", "old-b", 10, 40 * US), (92, None, "new-b", 10, 60 * US)],
        "rid long, a string, b string, user_id long, ts_us long",
    )
    row = temporal.asof_join(left, right, keys=["user_id"], ts_col="ts").collect()[0]
    assert row.rid_r == 92 and row.b_r == "new-b"
    assert row.a_r is None  # NOT "old-a"
    assert row.ts_r.timestamp() == 60


def test_asof_join_tolerance_bounds_lookback(spark):
    """A match older than tolerance nulls the whole payload; one inside the
    bound (endpoint inclusive) survives unchanged."""
    left = _ts_df(
        spark,
        [(1, 10, 100 * US), (2, 10, 500 * US), (3, 10, 160 * US)],
        "event_id long, user_id long, ts_us long",
    )
    right = _ts_df(
        spark,
        [(91, "p91", 10, 60 * US)],
        "rid long, pay string, user_id long, ts_us long",
    )
    out = {
        r.event_id: r
        for r in temporal.asof_join(
            left, right, keys=["user_id"], ts_col="ts", tolerance_us=100 * US
        ).collect()
    }
    assert out[1].rid_r == 91 and out[1].pay_r == "p91"  # 40s old, inside bound
    assert out[3].rid_r == 91  # exactly 100s old: endpoint inclusive
    # 440s old: every payload field nulls together, not just some
    assert out[2].rid_r is None and out[2].pay_r is None and out[2].ts_r is None


def test_asof_join_matched_ts_forwarded(spark):
    left = _ts_df(spark, [(1, 7, 90 * US)], "event_id long, user_id long, ts_us long")
    right = _ts_df(spark, [(55, 7, 30 * US)], "rid long, user_id long, ts_us long")
    row = temporal.asof_join(left, right, keys=["user_id"], ts_col="ts").collect()[0]
    assert row.ts_r.timestamp() == 30


def test_range_join_endpoint_inclusivity_and_bucket_boundary(spark):
    # interval [1000s, 1600s]; bucket width 600s → covers buckets 1 and 2
    intervals = spark.createDataFrame(
        [(1, 5, 1000 * US, 1600 * US)], "iid long, user_id long, start_us long, end_us long"
    )
    points = spark.createDataFrame(
        [
            (10, 5, 1000 * US),  # == start → in
            (11, 5, 1600 * US),  # == end → in
            (12, 5, 999 * US),  # just before → out
            (13, 5, 1601 * US),  # just after → out
            (14, 5, 1300 * US),  # bucket 2 (boundary-crossing candidate) → in
            (15, 6, 1300 * US),  # other key → out
        ],
        "pid long, user_id long, ts_us long",
    )
    got = sorted(
        r.pid
        for r in temporal.range_join(
            points, intervals, keys=["user_id"], bucket_us=600 * US
        ).collect()
    )
    assert got == [10, 11, 14]


def test_rollup_chain_levels_are_consistent(spark):
    # values chosen so double re-aggregation would drift without fixed-point
    rows = [(i, 1700000000 * US + i * 400 * US, "a", 0.1) for i in range(60)]
    events = _ts_df(spark, rows, "event_id long, ts_us long, event_type string, value double")
    levels = temporal.rollup_chain(events, dims=["event_type"], scale=3)
    total_5m = levels["5m"].agg(F.sum("fixed_sum"), F.sum("n_events")).collect()[0]
    total_day = levels["day"].agg(F.sum("fixed_sum"), F.sum("n_events")).collect()[0]
    assert tuple(total_5m) == tuple(total_day) == (6000, 60)  # 60 × 0.1 exactly
    day = temporal.finish_rollup(levels["day"]).collect()
    assert all(r.value_sum == r.n_events * 0.1 for r in day)


def test_rollup_one_pass_matches_chain(spark):
    rows = [(i, 1700000000 * US + i * 777 * US, "t" + str(i % 2), float(i) / 8) for i in range(200)]
    events = _ts_df(spark, rows, "event_id long, ts_us long, event_type string, value double")
    chain = temporal.rollup_chain(events, dims=["event_type"], scale=3)
    chained = {
        (g, r.bucket_start, r.event_type): (r.n_events, r.value_sum)
        for g in ("hour", "day")
        for r in temporal.finish_rollup(chain[g]).collect()
    }
    one_pass = {
        (r.grain, r.bucket_start, r.event_type): (r.n_events, r.value_sum)
        for r in temporal.rollup_grains_one_pass(events, dims=["event_type"], scale=3).collect()
    }
    assert one_pass == chained
    plan = (
        temporal.rollup_grains_one_pass(events, dims=["event_type"], scale=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2  # base agg + grouping sets


def test_burst_alerts_range_frame_semantics(spark, tmp_path):
    """The alert window is event-TIME (RANGE frame), not a row count: a 3rd
    error outside the trailing window must not alert, one inside must."""
    from pyspark.sql import functions as F, Window
    from datalake2anomali_spark.plans.temporal_queries import BURST_WINDOW_US

    US = 1_000_000
    base = 1_700_000_000 * US
    rows = [
        # user 1: two errors 10s apart -> second alerts (n_recent=2)
        (1, 1, base),
        (2, 1, base + 10 * US),
        # user 2: two errors separated by MORE than the window -> no alert
        (3, 2, base),
        (4, 2, base + BURST_WINDOW_US + US),
        # user 3: exactly at the window edge (inclusive) -> alerts
        (5, 3, base),
        (6, 3, base + BURST_WINDOW_US),
    ]
    err = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-BURST_WINDOW_US, 0)
    out = {
        r.event_id: r.n_recent
        for r in err.withColumn("n_recent", F.count(F.lit(1)).over(w))
        .filter(F.col("n_recent") >= 2)
        .collect()
    }
    assert set(out) == {2, 6}
    assert out[2] == 2 and out[6] == 2


def test_gap_fill_locf_semantics(spark):
    from datetime import datetime

    from datalake2anomali_spark.operators.temporal import gap_fill

    # user 1: events in hours 0 and 3 (1h buckets) -> buckets 1,2 are gaps
    # user 2: single event -> single-bucket spine, no gaps
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 1.0),
        (1, datetime(2024, 1, 1, 0, 40), 2.0),
        (1, datetime(2024, 1, 1, 3, 5), 10.0),
        (2, datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = gap_fill(df, bucket_minutes=60).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = by_user[1]
    assert [r["bucket"] - u1[0]["bucket"] for r in u1] == [0, 1, 2, 3]
    assert [r["n_events"] for r in u1] == [2, 0, 0, 1]
    assert [r["is_gap"] for r in u1] == [False, True, True, False]
    assert [r["v_locf"] for r in u1] == [3.0, 3.0, 3.0, 10.0]
    u2 = by_user[2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1 and u2[0]["v_locf"] == 7.0


def test_scd2_history_intervals(spark):
    from datetime import datetime

    from datalake2anomali_spark.operators.temporal import scd2_history

    rows = [
        (1, 10, datetime(2024, 1, 1, 0), "a", 0.0),
        (1, 11, datetime(2024, 1, 2, 0), "a", 0.0),  # no change -> merged
        (1, 12, datetime(2024, 1, 3, 0), "b", 0.0),  # change
        (1, 13, datetime(2024, 1, 4, 0), "a", 0.0),  # change back
        (2, 20, datetime(2024, 1, 1, 0), "x", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    out = sorted(
        scd2_history(df).collect(), key=lambda r: (r["user_id"], r["valid_from_us"])
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert [r["attr"] for r in u1] == ["a", "b", "a"]
    # each interval closes at the next change's event time
    assert [r["valid_to_us"] for r in u1[:-1]] == [
        u1[1]["valid_from_us"],
        u1[2]["valid_from_us"],
    ]
    assert u1[-1]["valid_to_us"] is None and u1[-1]["is_current"]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_state_at_times_half_open_intervals(spark):
    """Probe exactly AT a boundary belongs to the NEXT interval; probes
    before any history or in no interval yield nothing."""
    from datalake2anomali_spark.operators.temporal import state_at_times

    h = spark.createDataFrame(
        [
            (1, "a", 100, 200, False),
            (1, "b", 200, None, True),
            (2, "x", 150, None, True),
        ],
        "user_id long, attr string, valid_from_us long, valid_to_us long, is_current boolean",
    )
    out = {
        (r.as_of_us, r.user_id): r.attr
        for r in state_at_times(h, [50, 100, 200, 500]).collect()
    }
    assert out == {
        (100, 1): "a",  # inclusive valid_from
        (200, 1): "b",  # boundary probe → NEXT interval (half-open)
        (500, 1): "b",  # open current interval
        (200, 2): "x",
        (500, 2): "x",
    }


def test_asof_join_forward_and_nearest(spark):
    """direction='forward' matches the oldest right row at-or-after;
    'nearest' picks the closer side with ties to backward; tolerance
    applies per direction — pinned against hand-computed matches."""
    from datalake2anomali_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 390, "c"), (2, 50, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, "r90"), (1, 200, "r200"), (1, 400, "r400")],
        "k long, ts long, q string",
    )

    fwd = {
        (r.k, r.ts): r.q_r
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert fwd == {(1, 100): "r200", (1, 205): "r400", (1, 390): "r400", (2, 50): None}

    near = {
        (r.k, r.ts): r.q_r
        for r in asof_join(left, right, ["k"], direction="nearest").collect()
    }
    # 100: b=90 (d10) vs f=200 (d100) -> r90; 205: b=200 (d5) vs f=400 -> r200
    # 390: b=200 (d190) vs f=400 (d10) -> r400
    assert near == {(1, 100): "r90", (1, 205): "r200", (1, 390): "r400", (2, 50): None}

    # equal distance ties to backward
    mid = spark.createDataFrame([(1, 300, "m")], "k long, ts long, tag string")
    tie = asof_join(mid, right, ["k"], direction="nearest").collect()[0]
    assert tie.q_r == "r200"  # 300 is 100 from both 200 and 400

    # inclusive boundary: a right row at the same ts matches both directions
    eq = spark.createDataFrame([(1, 200, "e")], "k long, ts long, tag string")
    assert asof_join(eq, right, ["k"], direction="forward").collect()[0].q_r == "r200"
    assert asof_join(eq, right, ["k"], direction="backward").collect()[0].q_r == "r200"

    # tolerance: forward match farther than 50 nulls out
    tol = {
        (r.k, r.ts): r.q_r
        for r in asof_join(
            left, right, ["k"], direction="forward", tolerance_us=50
        ).collect()
    }
    assert tol == {(1, 100): None, (1, 205): None, (1, 390): "r400", (2, 50): None}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], direction="sideways")
