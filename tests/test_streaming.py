"""Streaming surface tests (SURVEY.md §2.9 / §7 step 6).

The single-batch availableNow paths are oracle-checked by the driver
(plans/streaming_queries.py); these tests cover what the batch oracle cannot:
late-data drops across watermark advances, state carried between micro-batches
and the incremental cursor's pushdown contract.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.streaming import incremental, stateful, windows

US = 1_000_000
NS = 1_000_000_000
T0 = 1_700_000_000  # epoch seconds, aligned to 100s (and to 5-min buckets? no)
BASE = 1_699_999_800  # 2023-11-14 22:10:00 UTC — multiple of 300 (5-min aligned)


def _write_events(path: str, rows: list[tuple[int, int, int, str, float]], mtime: int) -> None:
    """One parquet file with the raw events schema (ts = epoch ns as INT64)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * NS for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))  # file source orders batches by mtime


def test_tumbling_counts_batch_semantics(spark, sf_dir):
    """Window starts are epoch-aligned and counts partition the input."""
    out = windows.tumbling_counts(load_table(spark, sf_dir, "events"), minutes=5)
    rows = out.collect()
    assert rows
    assert all(r.w_start % 300 == 0 for r in rows)
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_session_window_matches_lag_cumsum(spark, sf_dir):
    """Native session_window session count per user == gaps-and-islands count."""
    e = load_table(spark, sf_dir, "events")
    native = (
        windows.session_window_stats(e, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = 30 * 60 * US
    prev = F.lag("ts").over(w)
    marked = e.withColumn(
        "new_sess",
        F.when(
            prev.isNull() | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) >= gap_us), 1
        ).otherwise(0),
    )
    manual = marked.groupBy("user_id").agg(F.sum("new_sess").alias("n_sessions"))
    diff = native.join(manual, "user_id").filter(
        native.n_sessions != manual.n_sessions
    )
    assert diff.count() == 0


def test_cross_tick_watermark_drops_late_and_holds_open_windows(spark, tmp_path):
    """Two scheduler ticks sharing a checkpoint enforce watermark semantics.

    Tick 2 starts with the committed watermark (22:19) from tick 1, so its
    late row (21:50) is dropped before aggregation, the finalized batch-1
    window is appended exactly once, and the still-open fresh window (22:35)
    is withheld.  Within a *single* availableNow run Spark's late-record
    filter only uses the startup watermark, so the drop is a cross-tick
    guarantee — which is exactly the reference's cron-tick shape (T1).
    """
    d = tmp_path / "events_in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    d.mkdir()

    def tick():
        stream = incremental.read_events_stream(spark, str(d))
        agg = windows.tumbling_counts(stream.withWatermark("ts", "5 minutes"), minutes=5)
        incremental.run_tick(agg, out, ckpt)

    # tick 1: five events 22:20:00..22:24:00, one 5-min window [22:20, 22:25)
    _write_events(
        str(d / "b1.parquet"),
        [(i, BASE + 600 + i * 60, 1, "click", 1.0) for i in range(5)],
        mtime=1_000_000,
    )
    tick()
    # tick 2: a row far below the committed watermark + a fresh row at 22:35
    _write_events(
        str(d / "b2.parquet"),
        [(100, BASE - 1200, 1, "late", 1.0), (101, BASE + 1500, 1, "click", 1.0)],
        mtime=1_000_100,
    )
    tick()

    rows = {r.w_start: r.n_events for r in spark.read.parquet(out).collect()}
    assert rows.get(BASE + 600) == 5  # finalized window, emitted exactly once
    assert BASE - 1200 not in rows  # late row dropped at tick-2 ingest
    assert BASE + 1500 not in rows  # open window withheld in append mode


def test_stream_dedup_across_batches_and_state_expiry(spark, tmp_path):
    """dropDuplicatesWithinWatermark: cross-batch dups collapse while the
    key is inside the watermark horizon; once the watermark passes, the
    state is evicted and the key may legitimately reappear."""
    d = tmp_path / "events_in"
    d.mkdir(exist_ok=True)
    # batch 1: ids 1,2 at BASE; batch 2 (same availableNow run, 2 files →
    # maxFilesPerTrigger=1 splits them): id 1 again shortly after (within
    # the 5-min watermark → dropped) + id 3
    _write_events(
        str(d / "b1.parquet"),
        [(1, BASE, 1, "click", 1.0), (2, BASE + 10, 1, "click", 1.0)],
        mtime=1_000_000,
    )
    _write_events(
        str(d / "b2.parquet"),
        [(1, BASE + 60, 1, "dup", 1.0), (3, BASE + 70, 1, "click", 1.0)],
        mtime=1_000_100,
    )
    stream = incremental.read_events_stream(spark, str(d), max_files_per_trigger=1)
    deduped = incremental.stream_dedup(stream, key_cols=("event_id",), watermark="5 minutes")
    out = incremental.run_to_completion(
        deduped.select("event_id", "event_type"), output_mode="append"
    )
    rows = sorted((r.event_id, r.event_type) for r in out.collect())
    assert rows == [(1, "click"), (2, "click"), (3, "click")]


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState folds batch-2 events into batch-1 state."""
    d = tmp_path / "events_in"
    d.mkdir()
    _write_events(
        str(d / "b1.parquet"),
        [(1, BASE, 7, "click", 1.25), (2, BASE + 60, 7, "click", 2.5)],
        mtime=1_000_000,
    )
    _write_events(
        str(d / "b2.parquet"),
        [(3, BASE + 120, 7, "click", 4.125), (4, BASE + 180, 8, "view", 1.0)],
        mtime=1_000_100,
    )
    stream = incremental.read_events_stream(spark, str(d), max_files_per_trigger=1)
    out = incremental.run_to_completion(
        stateful.user_profiles_stream(stream, idle_timeout=False),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {(r.user_id, r.n_events): r for r in out.collect()}
    # user 7 emitted twice (once per batch); final state has all 3 events
    final7 = rows[(7, 3)]
    assert final7.value_sum == pytest.approx(7.875)
    assert final7.first_us == BASE * US and final7.last_us == (BASE + 120) * US
    assert (7, 2) in rows  # the intermediate batch-1 emission
    assert rows[(8, 1)].value_sum == pytest.approx(1.0)


def test_high_watermark_cursor_roundtrip(spark, sf_dir, tmp_path):
    cur = incremental.HighWatermarkCursor(spark, str(tmp_path / "cursor"))
    assert cur.read() is None
    events = load_table(spark, sf_dir, "events")
    batch, wm = incremental.incremental_pull(events, cur)
    assert batch.count() == events.count()  # first pull: everything
    cur.commit(wm)
    assert cur.read() == wm
    batch2, wm2 = incremental.incremental_pull(events, cur)
    assert batch2.count() == 0  # nothing newer than the committed watermark
    assert wm2 == wm


def test_incremental_pull_pushes_filter_to_scan(spark, tmp_path):
    """On a natively timestamp-typed table the cursor predicate reaches the scan."""
    src = str(tmp_path / "clean_events")
    spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros((F.lit(BASE * US) + F.col("id") * 60 * US)).alias("ts"),
    ).write.parquet(src)
    cur = incremental.HighWatermarkCursor(spark, str(tmp_path / "cursor"))
    cur.commit((BASE + 50 * 60) * US)
    batch, wm = incremental.incremental_pull(spark.read.parquet(src), cur)
    assert batch.count() == 49  # ids 51..99 are strictly newer
    assert wm == (BASE + 99 * 60) * US
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(ts" in plan


def test_memory_sinks_released_between_runs(spark, sf_dir):
    """Past streaming results must not accrete: each run_to_completion drops
    the sink temp views of runs before the previous one (keeping exactly the
    current + one prior, so the immediately-preceding caller's result stays
    resolvable) and resets the terminated-query registry."""
    from datalake2anomali_spark.streaming.incremental import _PAST_SINKS

    for _ in range(3):
        incremental.stream_tumbling_counts(spark, sf_dir)
    assert len(_PAST_SINKS) <= 2
    live = {t.name for t in spark.catalog.listTables() if t.name.startswith("d2a_stream_")}
    assert live == set(_PAST_SINKS)
    assert len(spark.streams.active) == 0


def test_cursor_filter_pushes_down_on_real_events(spark, sf_dir, tmp_path):
    """VERDICT r3 #7: with events.ts natively timestamp-typed (MICROS
    testdata scanned under inferTimestampNTZ=false), the incremental-pull
    cursor predicate must reach the actual events parquet scan."""
    events = load_table(spark, sf_dir, "events")
    mid = events.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    cur = incremental.HighWatermarkCursor(spark, str(tmp_path / "real_cursor"))
    cur.commit(int(mid))
    batch, wm = incremental.incremental_pull(events, cur)
    assert 0 < batch.count() < events.count()
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(ts" in plan


def test_stream_dedup_late_distinguishes_watermark(spark, sf_dir):
    """The late-replay gate query must differ from plain distinct-by-key on
    both axes: late rows dropped, expired-key retransmissions re-emitted."""
    out = incremental.stream_dedup_late(spark, sf_dir).persist()
    ev = load_table(spark, sf_dir, "events")
    n_base = ev.count()
    n_fresh = ev.filter(F.col("event_id") % 100 == 7).count()
    lo = ev.agg(F.min("ts").alias("lo")).collect()[0].lo
    n_redup = ev.filter(
        (F.col("event_id") % 20 == 0)
        & (F.col("ts") < F.lit(lo) + F.expr("INTERVAL 5 DAYS"))
    ).count()
    assert out.count() == n_base + n_fresh + n_redup
    # the retransmitted keys appear exactly twice; late_new keys not at all
    assert out.groupBy("event_id").count().filter("count = 2").count() == n_redup
    assert out.filter(F.col("event_type") == "late_new").count() == 0
    out.unpersist()


def test_stream_interval_join_buffers_state_across_batches(spark, tmp_path):
    """An error seen in batch 1 must still match clicks arriving in batch 2
    (join state buffered), while clicks outside the 6h horizon never match."""
    from datalake2anomali_spark.streaming import joins

    d = tmp_path / "ij"
    d.mkdir()
    # batch 1: one error for user 7 at BASE
    _write_events(str(d / "00.parquet"), [(1, BASE, 7, "error", 0.0)], BASE)
    # batch 2: a click 1h later (matches), a click 7h later (outside the
    # horizon), and a click by another user (no key match)
    _write_events(
        str(d / "01.parquet"),
        [
            (2, BASE + 3600, 7, "click", 0.0),
            (3, BASE + 7 * 3600, 7, "click", 0.0),
            (4, BASE + 3600, 8, "click", 0.0),
        ],
        BASE + 10,
    )
    stream = incremental.read_events_stream(spark, str(d), max_files_per_trigger=1)
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    errors = incremental.read_events_stream(
        spark, str(d), max_files_per_trigger=1
    ).filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_event_id"),
        F.col("user_id").alias("err_user_id"),
        F.col("ts").alias("err_ts"),
    )
    out = incremental.run_to_completion(
        joins.interval_join(clicks, errors), output_mode="append", state_partitions=2
    )
    rows = out.collect()
    assert [(r.err_event_id, r.click_event_id, r.lag_us) for r in rows] == [
        (1, 2, 3600 * US)
    ]


def test_stream_burst_alerts_across_batches(spark, tmp_path):
    """An alert must fire when the qualifying earlier error arrived in a
    PREVIOUS micro-batch — the state (in-horizon timestamps) is what makes
    the streaming twin more than a per-batch window count."""
    import glob
    import shutil

    from datalake2anomali_spark.streaming.incremental import run_to_completion
    from datalake2anomali_spark.streaming.stateful import burst_alerts_stream

    W = 600 * US  # 10-minute horizon for the test
    rows1 = [(1, BASE * US, 7, "error"), (2, BASE * US, 8, "error")]
    rows2 = [
        (3, (BASE + 60) * US, 7, "error"),       # 60s after batch-1 -> alert
        (4, (BASE + 2000) * US, 8, "error"),     # outside horizon -> no alert
    ]
    inp = tmp_path / "input"
    inp.mkdir()
    for i, rows in enumerate([rows1, rows2]):
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        dst = inp / f"{i:02d}.parquet"
        shutil.move(glob.glob(str(stage / "part-*.parquet"))[0], str(dst))
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(inp))
    )
    out = run_to_completion(
        burst_alerts_stream(stream, n_alert=2, window_us=W),
        output_mode="append",
        state_partitions=2,
    ).collect()
    alerts = {r.event_id: r.n_recent for r in out}
    assert alerts == {3: 2}  # cross-batch alert fired; stale pair did not


def _burst_file_stream(spark, tmp_path, batches):
    """Stage per-batch parquet files (mtime-ordered) and open a 1-file-per-
    trigger stream over them.  ``batches`` = list of row lists, each row
    (event_id, ts_us, user_id, event_type)."""
    import glob
    import shutil

    inp = tmp_path / "input"
    inp.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        dst = inp / f"{i:02d}.parquet"
        shutil.move(glob.glob(str(stage / "part-*.parquet"))[0], str(dst))
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(inp))
    )


def test_stream_burst_alerts_out_of_order(spark, tmp_path):
    """Cross-batch DISORDER: a late-arriving earlier error must still
    (a) fire its own alert with the exact batch-twin count and (b) complete
    the burst of a LATER event whose decision would otherwise already be
    made.  With watermark-held buffering (lateness_us) the streaming rows
    equal the batch RANGE-frame twin's rows exactly."""
    from pyspark.sql import Window

    from datalake2anomali_spark.streaming.incremental import run_to_completion
    from datalake2anomali_spark.streaming.stateful import burst_alerts_stream

    W = 600 * US  # 10-minute trailing window
    L = 120 * US  # declared disorder bound: 2 minutes
    # user 7: e1(t0) and e3(t0+100s) arrive first; e2(t0+50s) arrives one
    # batch LATE (within the bound); e9 closes the stream far in the future
    # so the per-key watermark passes every pending event.
    batches = [
        [(1, BASE * US, 7, "error"), (3, (BASE + 100) * US, 7, "error")],
        [(2, (BASE + 50) * US, 7, "error")],
        [(9, (BASE + 10_000) * US, 7, "error")],
    ]
    stream = _burst_file_stream(spark, tmp_path, batches)
    got = run_to_completion(
        burst_alerts_stream(stream, n_alert=2, window_us=W, lateness_us=L),
        output_mode="append",
        state_partitions=2,
    )
    got_rows = {(r.event_id, r.user_id, r.ts_us, r.n_recent) for r in got.collect()}
    # batch RANGE-frame twin over the SAME rows (plans/temporal_queries.py
    # semantics), computed in-test so the equality is row-for-row
    all_rows = [r for batch in batches for r in batch]
    events = spark.createDataFrame(
        all_rows, "event_id long, ts_us long, user_id long, event_type string"
    )
    frame = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-W, 0)
    expect = {
        (r.event_id, r.user_id, r.ts_us, r.n_recent)
        for r in events.withColumn("n_recent", F.count(F.lit(1)).over(frame))
        .filter(F.col("n_recent") >= 2)
        .collect()
    }
    assert got_rows == expect
    # the late arrival fired its own alert AND completed e3's burst (n=3,
    # impossible without recounting e3 after e2 arrived)
    assert {e for e, *_ in got_rows} == {2, 3}
    assert {r[3] for r in got_rows if r[0] == 3} == {3}


def test_stream_burst_alerts_beyond_bound_drops(spark, tmp_path):
    """An arrival later than the declared lateness bound is dropped — the
    per-key twin of Spark's withWatermark late-row policy — rather than
    silently counted against a truncated window."""
    from datalake2anomali_spark.streaming.incremental import run_to_completion
    from datalake2anomali_spark.streaming.stateful import burst_alerts_stream

    W = 600 * US
    L = 120 * US
    batches = [
        [(6, (BASE + 500) * US, 8, "error")],
        # 500s behind the key's max — far beyond the 120s bound -> dropped
        [(5, BASE * US, 8, "error")],
        [(9, (BASE + 10_000) * US, 8, "error")],
    ]
    stream = _burst_file_stream(spark, tmp_path, batches)
    got = run_to_completion(
        burst_alerts_stream(stream, n_alert=2, window_us=W, lateness_us=L),
        output_mode="append",
        state_partitions=2,
    ).collect()
    # with e5 dropped, e6 never reaches n=2: no alerts at all
    assert got == []


def test_stream_sessionize_merges_open_sessions_across_batches(spark, tmp_path):
    """session_window state MERGE: two open sessions from batch 1 collapse
    into one when batch-2 bridging events connect them (the behavior that
    distinguishes the stateful session operator from a mere windowed agg)."""
    d = tmp_path / "events_in"
    d.mkdir()
    # batch 1: two events 3600s apart → two separate open sessions (gap 1800s)
    _write_events(
        str(d / "b1.parquet"),
        [(1, BASE, 7, "click", 1.0), (2, BASE + 3600, 7, "click", 1.0)],
        mtime=1_000_000,
    )
    # batch 2: bridges at +1000 and +2600 chain all four events together
    _write_events(
        str(d / "b2.parquet"),
        [(3, BASE + 1000, 7, "click", 1.0), (4, BASE + 2600, 7, "click", 1.0)],
        mtime=1_000_100,
    )
    stream = incremental.read_events_stream(spark, str(d), max_files_per_trigger=1)
    agg = windows.session_window_stats(stream.withWatermark("ts", "2 hours"))
    out = incremental.run_to_completion(agg, output_mode="complete")
    rows = out.collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.user_id, r.sess_start, r.n_events, r.duration_us) == (
        7, BASE, 4, 3600 * 1_000_000
    )


def test_maintain_rollup_view_merges_across_batches(spark, tmp_path):
    """foreachBatch view refresh: batch 2 must MERGE into batch 1's stored
    state (counts add, min/max widen) rather than replace it."""
    d = tmp_path / "events_in"
    d.mkdir()
    _write_events(
        str(d / "b1.parquet"),
        [(1, BASE, 7, "click", 1.25), (2, BASE + 60, 7, "click", 2.50)],
        mtime=1_000_000,
    )
    _write_events(
        str(d / "b2.parquet"),
        [(3, BASE + 120, 7, "click", 4.00), (4, BASE + 180, 8, "view", 1.00)],
        mtime=1_000_100,
    )
    batches = []
    view = str(tmp_path / "view")
    stream = incremental.read_events_stream(spark, str(d), max_files_per_trigger=1)

    # wrap to count micro-batches without touching the operator
    from datalake2anomali_spark.operators import views as _views

    real_rollup = _views.rollup_state

    def counting_rollup(df, keys, sum_cols=None, minmax_cols=None):
        batches.append(1)
        return real_rollup(df, keys, sum_cols, minmax_cols)

    _views.rollup_state = counting_rollup
    try:
        incremental.maintain_rollup_view(
            stream, view, keys=["event_type"], sum_cols={"value": 2},
            minmax_cols=["event_id"],
        )
    finally:
        _views.rollup_state = real_rollup

    assert len(batches) == 2, "maxFilesPerTrigger=1 must yield two merge batches"
    out = {r.event_type: r for r in spark.read.parquet(view).collect()}
    assert (out["click"].n_rows, out["click"].sum_value) == (3, 775)
    assert (out["click"].min_event_id, out["click"].max_event_id) == (1, 3)
    assert (out["view"].n_rows, out["view"].sum_value) == (1, 100)


def test_scd2_stream_closes_and_extends_across_batches(spark, tmp_path):
    """Cross-batch stitching, both directions: an attr CHANGE arriving in a
    later batch closes the stored current interval at the change's
    timestamp; a same-attr continuation must NOT open a new interval."""
    import os

    from pyspark.sql import functions as F

    from datalake2anomali_spark.streaming.incremental import (
        maintain_scd2_history,
        read_scd2_history,
    )

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    us = 1_000_000

    def mk(rows):
        return spark.createDataFrame(
            [(u, F.lit(None), t, a, e) for (u, t, a, e) in rows],
            "user_id long, _x string, ts_us long, event_type string, event_id long",
        ).select(
            "user_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "event_id",
        )

    # batch 1: user 1 opens 'a'; user 2 opens 'x'
    mk([(1, 10 * us, "a", 100), (2, 10 * us, "x", 101)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt)
    h1 = {
        (r.user_id, r.attr): (r.valid_from_us, r.valid_to_us, r.is_current)
        for r in read_scd2_history(spark, hist).collect()
    }
    assert h1[(1, "a")] == (10 * us, None, True)

    # batch 2: user 1 changes to 'b' (close + open); user 2 continues 'x'
    # (extend — no new interval)
    mk([(1, 20 * us, "b", 200), (2, 25 * us, "x", 201)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt)
    rows = read_scd2_history(spark, hist).collect()
    got = {(r.user_id, r.attr): (r.valid_from_us, r.valid_to_us, r.is_current) for r in rows}
    assert got[(1, "a")] == (10 * us, 20 * us, False)  # closed at the change
    assert got[(1, "b")] == (20 * us, None, True)
    assert got[(2, "x")] == (10 * us, None, True)  # extended, not re-opened
    assert len(rows) == 3

    # the closed store is append-only: closing happened exactly once
    closed = spark.read.parquet(os.path.join(hist, "closed"))
    assert closed.count() == 1


def test_exactly_once_ledger_replay_and_crash_window(spark, sf_dir, tmp_path):
    """The ledger skips replayed batch ids outright; and for the one crash
    window it cannot cover (applied but not yet marked), the keyed MERGE
    apply is idempotent — re-applying the identical batch converges to
    the same table."""
    import os

    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.publish import init_table, read_snapshot
    from datalake2anomali_spark.io.tables import load_table
    from datalake2anomali_spark.streaming.incremental import exactly_once_batch

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    root = str(tmp_path / "table")
    ledger = str(tmp_path / "ledger")
    init_table(spark, e.limit(200), root, "event_date")

    applied = []

    def _apply(batch_df, bid):
        from datalake2anomali_spark.io.publish import merge_into_versioned

        applied.append(bid)
        merge_into_versioned(
            spark, root, batch_df, ["event_id"], "event_date"
        )

    wrapped = exactly_once_batch(_apply, ledger)
    batch = e.filter(F.col("event_type") == "purchase").withColumn(
        "value", F.col("value") + 7.0
    )

    wrapped(batch, 42)
    fp = read_snapshot(spark, root, "event_date").agg(
        F.count(F.lit(1)), F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0]

    # checkpoint replay: same batch id arrives again — skipped entirely
    wrapped(batch, 42)
    assert applied == [42]

    # crash window: marker lost after a successful apply; the replay
    # re-applies, and the idempotent MERGE leaves the table unchanged
    os.remove(os.path.join(ledger, "batch-42.done"))
    wrapped(batch, 42)
    assert applied == [42, 42]
    fp2 = read_snapshot(spark, root, "event_date").agg(
        F.count(F.lit(1)), F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0]
    assert tuple(fp2) == tuple(fp)
    assert os.path.exists(os.path.join(ledger, "batch-42.done"))


def test_scd2_replay_is_idempotent_and_key_parameterized(spark, tmp_path):
    """At-least-once replay of the LAST batch (checkpoint commit lost
    between the history write and the commit log) must leave the stored
    history bit-identical — the per-batch-directory layout recomputes the
    replayed batch from exactly its pre-batch current state.  Run with a
    non-default key column to pin the reader's key parameter too."""
    import os

    from pyspark.sql import functions as F

    from datalake2anomali_spark.streaming.incremental import (
        maintain_scd2_history,
        read_scd2_history,
    )

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    us = 1_000_000

    def mk(rows):
        return spark.createDataFrame(
            [(u, t, a, e) for (u, t, a, e) in rows],
            "device_id long, ts_us long, event_type string, event_id long",
        ).select(
            "device_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "event_id",
        )

    mk([(1, 10 * us, "a", 100), (2, 10 * us, "x", 101)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt, key="device_id")
    mk([(1, 20 * us, "b", 200), (2, 25 * us, "x", 201)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt, key="device_id")

    def snap():
        return sorted(
            (r.device_id, r.attr, r.valid_from_us, r.valid_to_us, r.is_current)
            for r in read_scd2_history(spark, hist, key="device_id").collect()
        )

    before = snap()
    assert (1, "a", 10 * us, 20 * us, False) in before
    assert len(before) == 3

    # crash window: the history writes landed but the checkpoint commit
    # didn't — drop the newest commit record; the next tick replays the
    # batch with identical contents
    commits = os.path.join(ckpt, "commits")
    newest = max(os.listdir(commits), key=lambda n: int(n) if n.isdigit() else -1)
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")  # checksum-FS sidecar
    if os.path.exists(crc):
        os.remove(crc)
    maintain_scd2_history(spark, src, hist, ckpt, key="device_id")

    assert snap() == before  # no duplicated closed intervals, same current


def test_scd2_half_written_batch_dir_is_invisible(spark, tmp_path):
    """A crash mid-write leaves a batch directory without _SUCCESS; both
    the reader and the next tick's replay base must ignore it."""
    import os

    from pyspark.sql import functions as F

    from datalake2anomali_spark.streaming.incremental import (
        maintain_scd2_history,
        read_scd2_history,
    )

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    us = 1_000_000

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_us long, event_type string, event_id long"
        ).select(
            "user_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "event_id",
        )

    mk([(1, 10 * us, "a", 100)]).coalesce(1).write.mode("append").parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt)
    before = sorted(
        tuple(r) for r in read_scd2_history(spark, hist).collect()
    )

    # crash leftovers: half-written current and closed dirs for a batch
    # id that never committed (no _SUCCESS)
    for sub in ("current", "closed"):
        d = os.path.join(hist, sub, "batch=9")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
            fh.write(b"\x00not parquet")

    assert (
        sorted(tuple(r) for r in read_scd2_history(spark, hist).collect())
        == before
    )

    # the next tick must fold from the last COMMITTED current, not the junk
    mk([(1, 20 * us, "b", 200)]).coalesce(1).write.mode("append").parquet(src)
    maintain_scd2_history(spark, src, hist, ckpt)
    got = {
        (r.user_id, r.attr): (r.valid_from_us, r.valid_to_us, r.is_current)
        for r in read_scd2_history(spark, hist).collect()
    }
    assert got[(1, "a")] == (10 * us, 20 * us, False)
    assert got[(1, "b")] == (20 * us, None, True)


def test_full_outer_interval_join_matches_cutoff_oracle(spark, sf_dir):
    """FULL outer stream-stream interval join over a 3-micro-batch replay:
    matched pairs + click-side nulls (evicted at wm > click_ts) +
    error-side nulls (evicted at wm > err_ts + horizon) must equal the
    batch reference with both eviction deadlines applied by value."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.tables import load_table
    from datalake2anomali_spark.streaming.joins import (
        HORIZON_US,
        stream_click_error_join_full,
    )

    got = set(tuple(r) for r in stream_click_error_join_full(spark, sf_dir).collect())

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("euid"),
        F.col("ts").alias("ets"),
    )
    wm = (
        min(
            clicks.agg(F.max(F.unix_micros("cts"))).collect()[0][0],
            errors.agg(F.max(F.unix_micros("ets"))).collect()[0][0],
        )
        - 600 * US
    )
    cond = (
        (F.col("user_id") == F.col("euid"))
        & (F.col("cts") >= F.col("ets"))
        & (F.unix_micros("cts") <= F.unix_micros("ets") + HORIZON_US)
    )
    matched = clicks.join(errors, cond).select(
        "eid", "cid", F.col("user_id").alias("ju"),
        (F.unix_micros("cts") - F.unix_micros("ets")).alias("lag"),
        F.lit("both").alias("side"),
    )
    un_click = (
        clicks.join(errors, cond, "left_anti")
        .filter(F.unix_micros("cts") < wm)
        .select(
            F.lit(None).cast("long").alias("eid"), "cid",
            F.col("user_id").alias("ju"),
            F.lit(None).cast("long").alias("lag"),
            F.lit("click_only").alias("side"),
        )
    )
    un_err = (
        errors.join(
            clicks,
            (F.col("euid") == F.col("user_id"))
            & (F.col("cts") >= F.col("ets"))
            & (F.unix_micros("cts") <= F.unix_micros("ets") + HORIZON_US),
            "left_anti",
        )
        .filter(F.unix_micros("ets") + HORIZON_US < wm)
        .select(
            "eid",
            F.lit(None).cast("long").alias("cid"),
            F.col("euid").alias("ju"),
            F.lit(None).cast("long").alias("lag"),
            F.lit("error_only").alias("side"),
        )
    )
    want = set(
        tuple(r) for r in matched.unionByName(un_click).unionByName(un_err).collect()
    )
    assert got == want


def test_stream_enrich_sees_dim_updates_between_ticks(spark, sf_dir, tmp_path):
    """Each micro-batch joins the versioned dim's CURRENT snapshot: a
    MERGE landing between ticks changes the enrichment of the next tick
    only, and unmatched stream rows pass through with NULLs."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.publish import (
        init_table,
        merge_into_versioned,
    )
    from datalake2anomali_spark.io.tables import load_table
    from datalake2anomali_spark.streaming.incremental import (
        stream_enrich_with_table,
    )

    dim_root = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    users = spark.createDataFrame(
        [(u, "bronze", f"seg{u % 3}") for u in range(1, 40)],
        "user_id long, tier string, segment string",
    )
    init_table(spark, users, dim_root, "segment")

    e = load_table(spark, sf_dir, "events").limit(200)
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    stream_enrich_with_table(
        spark, src, dim_root, "segment", ["user_id"], out, ckpt
    )
    first = spark.read.parquet(out)
    assert first.filter(F.col("user_id") <= 39).filter(
        F.col("tier") != "bronze"
    ).count() == 0
    assert first.filter(F.col("user_id") > 39).filter(
        F.col("tier").isNotNull()
    ).count() == 0  # unmatched passes through with NULLs

    # dim update lands between ticks
    upd = users.withColumn("tier", F.lit("gold"))
    merge_into_versioned(spark, dim_root, upd, ["user_id"], "segment")

    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    stream_enrich_with_table(
        spark, src, dim_root, "segment", ["user_id"], out, ckpt
    )
    spark.catalog.refreshByPath(out)
    both = spark.read.parquet(out)
    tick1 = both.filter(F.col("event_id") % 2 == 0).filter(F.col("user_id") <= 39)
    tick2 = both.filter(F.col("event_id") % 2 == 1).filter(F.col("user_id") <= 39)
    assert tick1.filter(F.col("tier") != "bronze").count() == 0  # frozen history
    assert tick2.filter(F.col("tier") != "gold").count() == 0  # fresh snapshot
    assert tick2.count() > 0


def test_stream_into_hidden_matches_batch_window(spark, sf_dir):
    """Streaming MERGE into the hidden-partitioned table: after the
    availableNow ticks, the hidden-pruned between-read of the middle
    time window equals the plain batch computation over the source —
    duplicate or dropped batch effects, a wrong hidden layout column,
    or an off-by-one predicate bound would all break the rollup."""
    from datalake2anomali_spark.streaming.incremental import (
        load_sf_events,
        stream_into_hidden,
    )

    got = {
        r["event_type"]: (r["n_rows"], r["v_cents"], r["n_ids"])
        for r in stream_into_hidden(spark, sf_dir).collect()
    }
    e = load_sf_events(spark, sf_dir)
    lo, hi = e.agg(
        F.min(F.expr("unix_micros(ts)")), F.max(F.expr("unix_micros(ts)"))
    ).collect()[0]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * ((hi - lo) // 3)
    us = F.expr("unix_micros(ts)")
    want = {
        r["event_type"]: (r["n_rows"], r["v_cents"], r["n_ids"])
        for r in e.filter((us > cut1) & (us <= cut2))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_cents"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        .collect()
    }
    assert got == want
