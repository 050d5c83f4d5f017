"""Branches and tags over the versioned table (io/publish.py refs):
write-audit-publish isolation, fast-forward CAS, vacuum protection of
ref-pinned snapshots, tag immutability."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    ConcurrentWriteError,
    create_branch,
    create_tag,
    delete_branch,
    delete_from_versioned,
    delete_tag,
    fast_forward,
    init_table,
    list_refs,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
    read_tag,
    table_history,
    vacuum,
    version_dir,
)
from datalake2anomali_spark.io.tables import load_table


@pytest.fixture()
def vtable(spark, sf_dir, tmp_path):
    root = str(tmp_path / "events_refs")
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    init_table(spark, e, root, "event_date")
    return root


def _fingerprint(spark, root, **kw):
    df = read_snapshot(spark, root, "event_date", **kw)
    return (
        df.count(),
        df.agg(F.sum(F.hash(*sorted(df.columns))).alias("h")).collect()[0]["h"],
    )


def test_write_audit_publish_cycle(spark, sf_dir, vtable):
    """Branch writes are invisible on main until fast_forward; after the
    publish, main equals the branch head exactly."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    main_before = _fingerprint(spark, vtable)
    fork_v = create_branch(vtable, "audit")
    assert fork_v == read_manifest(vtable)["version"]

    upd = e.filter(F.col("event_type") == "purchase").withColumn(
        "value", F.col("value") + 7.0
    )
    ins = e.filter(F.col("event_type") == "error").withColumn(
        "event_id", F.col("event_id") + 70_000_000
    )
    merge_into_versioned(
        spark, vtable, upd.unionByName(ins), ["event_id"], "event_date",
        ref="audit",
    )
    v_b = delete_from_versioned(
        spark, vtable, "event_date", F.col("event_type") == "view", ref="audit"
    )

    # audit step: branch sees the writes, main is byte-identical to before
    assert _fingerprint(spark, vtable) == main_before
    branch_fp = _fingerprint(spark, vtable, ref="audit")
    assert branch_fp != main_before
    b = read_snapshot(spark, vtable, "event_date", ref="audit")
    assert b.filter(F.col("event_type") == "view").count() == 0
    assert b.count() == e.count() + ins.count() - e.filter(
        F.col("event_type") == "view"
    ).count()
    assert list_refs(vtable)["branches"]["audit"]["version"] == v_b

    # publish: main fast-forwards to the branch head, as a new commit
    v_pub = fast_forward(vtable, "audit")
    assert _fingerprint(spark, vtable) == branch_fp
    hist = {h["version"]: h for h in table_history(vtable)}
    assert hist[v_pub]["operation"] == f"publish(audit@v{v_b})"
    assert hist[v_pub]["ref"] == "main"
    assert hist[v_b]["ref"] == "audit"
    delete_branch(vtable, "audit")
    assert list_refs(vtable)["branches"] == {}


def test_fast_forward_refuses_diverged_main(spark, sf_dir, vtable):
    """If main advances after the fork, publishing the branch would drop
    main's commit — fast_forward must refuse (rebase, not merge)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    create_branch(vtable, "wip")
    merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "click").withColumn(
            "value", F.col("value") + 1.0
        ),
        ["event_id"],
        "event_date",
    )  # main moves
    merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "signup").withColumn(
            "value", F.col("value") + 2.0
        ),
        ["event_id"],
        "event_date",
        ref="wip",
    )
    with pytest.raises(ConcurrentWriteError, match="moved from"):
        fast_forward(vtable, "wip")
    # main's concurrent commit survived untouched
    m = read_snapshot(spark, vtable, "event_date")
    assert m.filter(
        (F.col("event_type") == "signup") & (F.col("value") > 1e6)
    ).count() == 0


def test_vacuum_protects_branch_and_tag_pins(spark, sf_dir, vtable):
    """A vacuum with retain_last=1 must keep every snapshot a branch head
    or tag references readable; dropping the refs releases them."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    v1 = read_manifest(vtable)["version"]
    create_tag(vtable, "train-v1")
    create_branch(vtable, "exp")
    merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "error").withColumn(
            "event_id", F.col("event_id") + 80_000_000
        ),
        ["event_id"],
        "event_date",
        ref="exp",
    )
    branch_fp = _fingerprint(spark, vtable, ref="exp")
    # advance main twice so v1 and the branch head fall out of retain_last
    for bump in (1.0, 2.0):
        merge_into_versioned(
            spark,
            vtable,
            e.filter(F.col("event_type") == "click").withColumn(
                "value", F.col("value") + bump
            ),
            ["event_id"],
            "event_date",
        )

    removed = vacuum(vtable, retain_last=1, claim_ttl_seconds=0.0)
    # tag pin: the v1 snapshot still time-travels; branch head still reads
    assert read_tag(vtable, "train-v1") == v1
    assert read_snapshot(
        spark, vtable, "event_date", version=read_tag(vtable, "train-v1")
    ).count() == e.count()
    assert _fingerprint(spark, vtable, ref="exp") == branch_fp
    branch_head_v = list_refs(vtable)["branches"]["exp"]["version"]
    assert branch_head_v not in removed and v1 not in removed

    delete_branch(vtable, "exp")
    delete_tag(vtable, "train-v1")
    removed2 = vacuum(vtable, retain_last=1, claim_ttl_seconds=0.0)
    assert branch_head_v in removed2
    assert not os.path.isdir(version_dir(vtable, branch_head_v))
    with pytest.raises(FileNotFoundError):
        read_tag(vtable, "train-v1")


def test_tag_immutability_and_ref_validation(spark, vtable):
    v = read_manifest(vtable)["version"]
    create_tag(vtable, "pin")
    with pytest.raises(FileExistsError):
        create_tag(vtable, "pin")  # tags never re-point
    assert read_tag(vtable, "pin") == v
    with pytest.raises(FileNotFoundError):
        create_tag(vtable, "ghost", version=999)  # must name a real commit
    for bad in ("main", "", "a/b", ".hidden", "sp ace"):
        with pytest.raises(ValueError, match="invalid ref name|reserved"):
            create_branch(vtable, bad)
    with pytest.raises(FileNotFoundError, match="no branch"):
        read_manifest(vtable, ref="nope")
    with pytest.raises(FileNotFoundError, match="no branch"):
        delete_branch(vtable, "nope")
    with pytest.raises(FileNotFoundError, match="no tag"):
        delete_tag(vtable, "nope")


def test_branch_create_refuses_duplicate(spark, vtable):
    create_branch(vtable, "dup")
    with pytest.raises(FileExistsError):
        create_branch(vtable, "dup")


def test_timestamp_time_travel_and_describe_detail(spark, sf_dir, vtable):
    """AS OF TIMESTAMP resolves between the recorded commit stamps, which
    are strictly increasing per pointer; DESCRIBE DETAIL summarizes the
    current snapshot from metadata alone."""
    from datalake2anomali_spark.io.publish import (
        describe_detail,
        merge_into_versioned,
        version_as_of_timestamp,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    v2 = merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "error").withColumn(
            "event_id", F.col("event_id") + 11_000_000
        ),
        ["event_id"],
        "event_date",
    )
    v3 = delete_from_versioned(
        spark, vtable, "event_date", F.col("event_type") == "signup"
    )
    hist = table_history(vtable)
    stamps = {h["version"]: h["committed_at"] for h in hist}
    assert all(at is not None for at in stamps.values())
    assert sorted(stamps.values()) == [stamps[v] for v in sorted(stamps)]

    v1 = min(stamps)
    assert version_as_of_timestamp(vtable, stamps[v1]) == v1
    mid = (stamps[v2] + stamps[v3]) / 2
    assert version_as_of_timestamp(vtable, max(mid, stamps[v2])) == v2
    assert version_as_of_timestamp(vtable, stamps[v3] + 1.0) == v3
    with pytest.raises(FileNotFoundError, match="no retained commit"):
        version_as_of_timestamp(vtable, stamps[v1] - 10.0)
    # the resolved version reads like any version time travel
    snap_v2 = read_snapshot(
        spark, vtable, "event_date",
        version=version_as_of_timestamp(vtable, stamps[v2]),
    )
    assert snap_v2.filter(F.col("event_type") == "signup").count() > 0

    d = describe_detail(vtable)
    assert d["version"] == v3
    assert d["operation"] == "delete"
    assert d["n_rows"] == snap_v2.count() - snap_v2.filter(
        F.col("event_type") == "signup"
    ).count()
    assert d["n_partitions"] == len(read_manifest(vtable)["partitions"])
    assert d["size_bytes"] > 0
    assert set(d["live_versions"]) == {
        int(x) for x in read_manifest(vtable)["partitions"].values()
    }
    assert d["refs"] == {"branches": {}, "tags": {}}


def test_follower_tracks_a_branch(spark, sf_dir, vtable, tmp_path):
    """A TableFollower with ref= follows the branch head: bootstrap from
    the fork snapshot, then the branch's own commits, while main's later
    commits never enter the feed."""
    from datalake2anomali_spark.io.publish import TableFollower

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    create_branch(vtable, "feed")
    f = TableFollower(
        vtable, "event_date", ["event_id"], str(tmp_path / "cur"), ref="feed"
    )
    boot, v0 = f.poll(spark)
    assert boot.count() == e.count()  # bootstrap = fork snapshot as adds
    f.commit(v0)

    # branch commit enters the feed; concurrent main commit does not
    merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "purchase").withColumn(
            "value", F.col("value") + 3.0
        ),
        ["event_id"],
        "event_date",
        ref="feed",
    )
    merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "click").withColumn(
            "value", F.col("value") + 4.0
        ),
        ["event_id"],
        "event_date",
    )
    ch, v1 = f.poll(spark)
    types = {r["change_type"] for r in ch.select("change_type").distinct().collect()}
    assert types == {"changed"}
    n_purchase = e.filter(F.col("event_type") == "purchase").count()
    assert ch.count() == n_purchase  # only the branch's merge, not main's
    f.commit(v1)
    again, _ = f.poll(spark)
    assert again is None  # caught up with the branch head


def test_as_of_timestamp_never_resolves_branch_commits(spark, sf_dir, vtable):
    """A branch commit carries the newest stamp in the shared history
    namespace but must be invisible to main AS OF TIMESTAMP resolution
    (and visible to the branch's own, via ref=)."""
    import time as _time

    from datalake2anomali_spark.io.publish import version_as_of_timestamp

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    v_main = read_manifest(vtable)["version"]
    create_branch(vtable, "tt")
    v_branch = merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "error").withColumn(
            "event_id", F.col("event_id") + 12_000_000
        ),
        ["event_id"],
        "event_date",
        ref="tt",
    )
    now = _time.time() + 5.0
    assert version_as_of_timestamp(vtable, now) == v_main  # not v_branch
    assert version_as_of_timestamp(vtable, now, ref="tt") == v_branch


def test_vacuum_window_counts_main_commits_only(spark, sf_dir, vtable):
    """Branch commits must not occupy retain_last slots: after branch
    activity, main's second-newest snapshot stays time-travel-readable
    under retain_last=2."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    v1 = read_manifest(vtable)["version"]
    v2 = merge_into_versioned(
        spark,
        vtable,
        e.filter(F.col("event_type") == "click").withColumn(
            "value", F.col("value") + 1.0
        ),
        ["event_id"],
        "event_date",
    )
    create_branch(vtable, "busy")
    for i in range(3):  # three branch commits with newer versions/stamps
        merge_into_versioned(
            spark,
            vtable,
            e.filter(F.col("event_type") == "error").withColumn(
                "event_id", F.col("event_id") + (13_000_000 + i)
            ),
            ["event_id"],
            "event_date",
            ref="busy",
        )
    vacuum(vtable, retain_last=2, claim_ttl_seconds=0.0)
    # main's window = {v1, v2}: both must still read; v1 especially —
    # before the fix the branch commits pushed it past the threshold
    assert read_snapshot(spark, vtable, "event_date", version=v1).count() == e.count()
    assert read_snapshot(spark, vtable, "event_date", version=v2).count() == e.count()


def test_streaming_ingest_into_branch_then_publish(spark, sf_dir, vtable, tmp_path):
    """Streaming write-audit-publish: micro-batches MERGE into a branch
    through the exactly-once ledger while main stays byte-identical;
    after the stream completes and the audit passes, one fast_forward
    publishes the whole ingest atomically."""
    from datalake2anomali_spark.streaming.incremental import (
        exactly_once_batch,
        read_events_stream,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    main_before = _fingerprint(spark, vtable)
    create_branch(vtable, "ingest")

    ins = e.filter(F.col("event_type") == "error").withColumn(
        "event_id", F.col("event_id") + 55_000_000
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ledger = str(tmp_path / "ledger")

    def _apply(batch_df, _bid):
        batch = batch_df.withColumn(
            "event_date", F.date_format("ts", "yyyy-MM-dd")
        )
        merge_into_versioned(
            batch_df.sparkSession, vtable, batch, ["event_id"], "event_date",
            ref="ingest",
        )

    wrapped = exactly_once_batch(_apply, ledger)
    half = ins.count() // 2
    first = ins.orderBy("event_id").limit(half)
    rest = ins.join(first.select("event_id"), "event_id", "left_anti")
    for tick in (first, rest):
        tick.drop("event_date").coalesce(1).write.mode("append").parquet(src)
        spark.catalog.refreshByPath(src)
        q = (
            read_events_stream(spark, src)
            .writeStream.foreachBatch(wrapped)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # audit invariant after EVERY tick: main never moves
        assert _fingerprint(spark, vtable) == main_before

    b = read_snapshot(spark, vtable, "event_date", ref="ingest")
    assert b.count() == e.count() + ins.count()  # audit passes

    fast_forward(vtable, "ingest")
    m = read_snapshot(spark, vtable, "event_date")
    assert m.count() == e.count() + ins.count()
    dup = m.groupBy("event_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0
