"""Crash-injection nets over the streaming exactly-once seams (VERDICT
r12 task 4): the foreachBatch idempotence-ledger window
(``exactly_once_batch`` — crash between the MERGE apply and the ledger
mark, crash inside the MERGE before any durable effect, and the
double-crash where the redelivery itself crashes), checkpoint-resume of
``maintain_scd2_history`` after a mid-batch kill at the current-store
write seam or a lost checkpoint commit, and the
``stream_into_hidden``-shaped pipeline (real availableNow ticks through
one durable checkpoint, ledger-wrapped MERGE into a hidden-partitioned
table) under the same crash alphabet.

These seams were previously pinned only by directed single-instance
tests (tests/test_refs.py, tests/test_streaming.py); each net here is
hypothesis-driven over randomized op sequences with the crash drawn per
step, so sequence interactions (GC of superseded current dirs + replay,
replay followed by another crash, crashes on consecutive ticks) are in
reach.  Injection points are the real seams — the ledger marker create
(``os.open`` on the marker path, AFTER the durable MERGE: the worst
instant), the manifest CAS (``publish._commit_checked``), and the
current-store parquet write — never test-only hooks.  Soak knob:
``SPARK_GRAFT_HYP_EXAMPLES=25 pytest tests/test_crash_model_streaming.py``.
"""

from __future__ import annotations

import os
import time
from unittest import mock

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
import pyspark.sql.readwriter as rw

from datalake2anomali_spark.io import publish as pubmod
from datalake2anomali_spark.io.hidden import (
    init_hidden_table,
    merge_into_hidden,
    read_hidden,
)
from datalake2anomali_spark.io.publish import (
    init_table,
    merge_into_versioned,
    read_snapshot,
)
from datalake2anomali_spark.operators.temporal import scd2_history
from datalake2anomali_spark.streaming import incremental as incmod
from datalake2anomali_spark.streaming.incremental import (
    exactly_once_batch,
    maintain_scd2_history,
    read_events_stream,
    read_scd2_history,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()
_US = 1_000_000


class _Boom(RuntimeError):
    pass


def _boom(*_a, **_k):
    raise _Boom("injected crash")


def _drain(spark, timeout=30.0):
    """Wait for the streams manager to unregister a crashed query so the
    next tick on the same checkpoint doesn't trip the concurrent-use
    guard (same drain maintain_scd2_history does on the happy path)."""
    deadline = time.monotonic() + timeout
    while spark.streams.active and time.monotonic() < deadline:
        time.sleep(0.02)


def _ledger_open_boom(ledger_dir: str):
    """os.open that crashes exactly at the ledger-marker create — the
    instant AFTER the durable apply, the worst crash window — and passes
    every other path through untouched."""
    real_open = os.open

    def sel(path, *a, **k):
        if isinstance(path, str) and path.startswith(ledger_dir):
            raise _Boom("injected crash at ledger mark")
        return real_open(path, *a, **k)

    return mock.patch.object(incmod.os, "open", sel)


# ---------------------------------------------------------------------------
# 1. exactly_once_batch: the ledger window around an idempotent MERGE
# ---------------------------------------------------------------------------

_eo_step = st.tuples(
    st.integers(1, 9),  # seed: which keys the batch touches + their value
    st.sampled_from(["clean", "crash_mark", "crash_apply", "double"]),
)


@settings(**_SETTINGS)
@given(st.lists(_eo_step, min_size=1, max_size=3))
def test_exactly_once_ledger_crash_windows(spark, tmp_path_factory, steps):
    """At-least-once redelivery through every crash window of the
    ledger must yield exactly-once EFFECTS: a crash after the MERGE but
    before the marker re-applies idempotently on redelivery; a crash
    inside the MERGE (before the manifest CAS) leaves the table at the
    pre-batch state and the redelivery lands the batch once; a crash at
    the mark whose redelivery ALSO crashes mid-MERGE still converges on
    the third delivery.  After every step the table equals the model of
    each batch applied exactly once and the ledger holds exactly one
    marker per completed batch id."""
    base = tmp_path_factory.mktemp("eonet")
    root, ledger = str(base / "table"), str(base / "ledger")

    model = {k: (str(k % 3), k * 10) for k in range(12)}
    init_table(
        spark,
        spark.createDataFrame(
            [(k, p, x) for k, (p, x) in model.items()],
            "k long, p string, x long",
        ),
        root,
        "p",
    )

    applied: list[int] = []

    def _apply(batch_df, _bid):
        applied.append(_bid)
        merge_into_versioned(spark, root, batch_df, ["k"], "p")

    wrapped = exactly_once_batch(_apply, ledger)

    def batch_rows(seed, bid):
        rows = [
            (k, p, seed * 100 + k)
            for k, (p, _x) in sorted(model.items())
            if k % 4 == seed % 4
        ]
        rows.append((50 + bid, str(seed % 3), seed))
        return rows

    def table_state():
        return {
            r["k"]: (r["p"], r["x"])
            for r in read_snapshot(spark, root, "p").collect()
        }

    done_bids: list[int] = []
    for bid, (seed, mode) in enumerate(steps):
        rows = batch_rows(seed, bid)
        batch = spark.createDataFrame(rows, "k long, p string, x long")

        if mode == "clean":
            wrapped(batch, bid)
        elif mode == "crash_mark":
            n_before = len(applied)
            with _ledger_open_boom(ledger):
                with pytest.raises(_Boom):
                    wrapped(batch, bid)
            # the apply WAS durable; only the marker is missing
            assert len(applied) == n_before + 1
            assert not os.path.exists(
                os.path.join(ledger, f"batch-{bid}.done")
            )
            wrapped(batch, bid)  # redelivery: re-applies (idempotent), marks
            assert len(applied) == n_before + 2
        elif mode == "crash_apply":
            pre = table_state()
            with mock.patch.object(pubmod, "_commit_checked", _boom):
                with pytest.raises(_Boom):
                    wrapped(batch, bid)
            assert table_state() == pre  # no durable effect before the CAS
            assert not os.path.exists(
                os.path.join(ledger, f"batch-{bid}.done")
            )
            wrapped(batch, bid)
        else:  # double: crash at mark, then the redelivery crashes mid-MERGE
            with _ledger_open_boom(ledger):
                with pytest.raises(_Boom):
                    wrapped(batch, bid)
            post_first = table_state()  # first apply landed
            with mock.patch.object(pubmod, "_commit_checked", _boom):
                with pytest.raises(_Boom):
                    wrapped(batch, bid)
            assert table_state() == post_first  # retry CAS crash: no change
            wrapped(batch, bid)  # third delivery converges

        # model: the batch's effects exactly once, whatever the crashes
        for k, p, x in rows:
            model[k] = (p, x)
        done_bids.append(bid)

        assert table_state() == model
        markers = sorted(os.listdir(ledger))
        assert markers == [f"batch-{b}.done" for b in done_bids]

    # a full redelivery sweep of every completed batch id is a no-op
    n_applied = len(applied)
    for bid, (seed, _mode) in enumerate(steps):
        wrapped(
            spark.createDataFrame(
                batch_rows(seed, bid), "k long, p string, x long"
            ),
            bid,
        )
    assert len(applied) == n_applied
    assert table_state() == model


# ---------------------------------------------------------------------------
# 2. maintain_scd2_history: checkpoint-resume after mid-batch kills
# ---------------------------------------------------------------------------

_scd2_step = st.tuples(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 2)),  # (key, attr idx)
        min_size=1,
        max_size=3,
    ),
    st.sampled_from(["clean", "kill_current_write", "replay_last"]),
)


def _current_write_boom():
    """DataFrameWriter.parquet that crashes exactly at the current-store
    write — AFTER the closed-interval directory committed, the worst
    instant for the per-batch-directory layout — and passes every other
    write through."""
    real_parquet = rw.DataFrameWriter.parquet

    def sel(self, path, *a, **k):
        if isinstance(path, str) and "/current/batch=" in path:
            raise _Boom("injected crash at current write")
        return real_parquet(self, path, *a, **k)

    return mock.patch.object(rw.DataFrameWriter, "parquet", sel)


def _drop_newest_ckpt_commit(ckpt: str) -> None:
    commits = os.path.join(ckpt, "commits")
    newest = max(
        os.listdir(commits), key=lambda n: int(n) if n.isdigit() else -1
    )
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")  # checksum-FS sidecar
    if os.path.exists(crc):
        os.remove(crc)


@settings(**_SETTINGS)
@given(st.lists(_scd2_step, min_size=1, max_size=3))
def test_scd2_streaming_crash_replay_net(spark, tmp_path_factory, steps):
    """Randomized tick sequences with per-tick crash draws: a kill at
    the current-store write (closed dir already committed) and a lost
    checkpoint commit (both history dirs committed) both replay the
    batch from exactly its pre-batch state, so after recovery the stored
    history always equals the batch ``scd2_history`` over every event
    delivered so far — across GC of superseded current dirs and crashes
    on consecutive ticks."""
    base = tmp_path_factory.mktemp("scd2net")
    src, hist, ckpt = str(base / "src"), str(base / "hist"), str(base / "ckpt")

    all_events: list[tuple[int, int, str, int]] = []
    next_ts = 10  # seconds; strictly increasing => per-key order holds
    next_eid = 100

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_us long, event_type string, event_id long"
        ).select(
            "user_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "event_id",
        )

    def stored():
        return sorted(
            (r.user_id, r.attr, r.valid_from_us, r.valid_to_us, r.is_current)
            for r in read_scd2_history(spark, hist).collect()
        )

    def oracle():
        return sorted(
            (r.user_id, r.attr, r.valid_from_us, r.valid_to_us, r.is_current)
            for r in scd2_history(mk(all_events)).collect()
        )

    for events, mode in steps:
        rows = []
        for key, attr_idx in events:
            rows.append((key, next_ts * _US, "abc"[attr_idx], next_eid))
            next_ts += 10
            next_eid += 1
        all_events.extend(rows)
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        spark.catalog.refreshByPath(src)

        if mode == "clean":
            maintain_scd2_history(spark, src, hist, ckpt)
        elif mode == "kill_current_write":
            with _current_write_boom():
                with pytest.raises(Exception):
                    maintain_scd2_history(spark, src, hist, ckpt)
            _drain(spark)
            # replay: recomputes from the pre-batch committed current and
            # overwrites the already-committed closed dir identically
            maintain_scd2_history(spark, src, hist, ckpt)
        else:  # replay_last: both writes committed, checkpoint commit lost
            maintain_scd2_history(spark, src, hist, ckpt)
            before = stored()
            _drop_newest_ckpt_commit(ckpt)
            maintain_scd2_history(spark, src, hist, ckpt)
            assert stored() == before  # bit-identical replay

        assert stored() == oracle()


# ---------------------------------------------------------------------------
# 3. stream-into-hidden: ledger-wrapped MERGE ticks over one checkpoint
# ---------------------------------------------------------------------------

_hid_step = st.tuples(
    st.integers(1, 9),  # seed for this tick's rows
    st.sampled_from(["clean", "crash_mark", "crash_merge"]),
)


@settings(**_SETTINGS)
@given(st.lists(_hid_step, min_size=1, max_size=3))
def test_stream_into_hidden_crash_net(spark, tmp_path_factory, steps):
    """The stream_into_hidden shape — real availableNow ticks through one
    durable checkpoint, each micro-batch MERGEd into a hidden-partitioned
    table through the idempotence ledger — under per-tick crash draws at
    both seams: the ledger mark (apply durable, marker lost; the stream
    REPLAYS the batch id on restart) and the manifest CAS (no durable
    effect; replay lands it once).  After every recovered tick the table
    holds every delivered event exactly once."""
    base = tmp_path_factory.mktemp("hidnet")
    src, root = str(base / "src"), str(base / "table")
    ckpt, ledger = str(base / "ckpt"), str(base / "ledger")

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_us long, event_type string, value double"
        ).select(
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            "value",
        )

    seed_rows = [(i, (i + 1) * 86_400 * _US, "seed", float(i)) for i in range(4)]
    init_hidden_table(spark, mk(seed_rows), root, ["days", "ts"])

    applied: list[int] = []

    def _apply(batch_df, bid):
        applied.append(bid)
        merge_into_hidden(batch_df.sparkSession, root, batch_df, ["event_id"])

    wrapped = exactly_once_batch(_apply, ledger)

    def run_tick():
        q = (
            read_events_stream(spark, src)
            .writeStream.foreachBatch(wrapped)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain(spark)

    def run_tick_crashing(patch_ctx):
        with patch_ctx:
            q = (
                read_events_stream(spark, src)
                .writeStream.foreachBatch(wrapped)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            with pytest.raises(Exception):
                q.awaitTermination()
        _drain(spark)

    expected = {eid: (et, v) for eid, _ts, et, v in seed_rows}
    next_eid = 100
    for seed, mode in steps:
        rows = [
            (next_eid + j, (seed * 30 + j + 1) * 86_400 * _US,
             f"t{seed % 3}", float(seed * 10 + j))
            for j in range(2)
        ]
        next_eid += 2
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        spark.catalog.refreshByPath(src)

        if mode == "clean":
            run_tick()
        elif mode == "crash_mark":
            n_before = len(applied)
            run_tick_crashing(_ledger_open_boom(ledger))
            assert len(applied) == n_before + 1  # the MERGE was durable
            run_tick()  # restart replays the same batch id; MERGE idempotent
            assert len(applied) == n_before + 2
        else:  # crash_merge: CAS crash, nothing durable; replay lands once
            run_tick_crashing(
                mock.patch.object(pubmod, "_commit_checked", _boom)
            )
            run_tick()

        for eid, _ts, et, v in rows:
            expected[eid] = (et, v)

        got = {
            r["event_id"]: (r["event_type"], r["value"])
            for r in read_hidden(spark, root).collect()
        }
        assert got == expected
        # exactly one marker per committed batch id, batch ids contiguous
        bids = sorted(
            int(n.split("-")[1].split(".")[0]) for n in os.listdir(ledger)
        )
        assert bids == list(range(len(bids)))
