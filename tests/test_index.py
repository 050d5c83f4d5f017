"""Secondary value index (io/index.py): bootstrap correctness, exact
pruning, incremental CDF-driven refresh, crash-replay idempotence, and
the stale-index refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.index import (
    create_value_index,
    index_lookup_partitions,
    indexed_read,
    refresh_value_index,
)
from datalake2anomali_spark.io.publish import (
    delete_from_versioned,
    init_table,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
)
from datalake2anomali_spark.io.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )


def _setup(spark, sf_dir, tmp_path):
    root = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_value_index(
        spark, root, "event_date", "user_id", ["event_id"], idx
    )
    return root, idx, e


def test_index_bootstrap_exact_pruning(spark, sf_dir, tmp_path):
    root, idx, e = _setup(spark, sf_dir, tmp_path)
    u = e.agg(F.min("user_id")).collect()[0][0]
    truth = {
        r[0]
        for r in e.filter(F.col("user_id") == u)
        .select("event_date")
        .distinct()
        .collect()
    }
    assert index_lookup_partitions(spark, idx, u) == truth
    got = indexed_read(spark, idx, u, refresh=False)
    want = read_snapshot(spark, root, "event_date").filter(
        F.col("user_id") == u
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the index is metadata-scale: (value, partition) pairs, not rows
    n_pairs = read_snapshot(spark, idx, "bucket").count()
    assert n_pairs == e.select("user_id", "event_date").distinct().count()


def test_index_incremental_refresh_and_idempotence(spark, sf_dir, tmp_path):
    root, idx, e = _setup(spark, sf_dir, tmp_path)
    syn_user = 999_999_999
    syn = (
        e.filter(F.col("event_id") % 97 == 0)
        .withColumn("event_id", F.col("event_id") + 80_000_000)
        .withColumn("user_id", F.lit(syn_user))
        .withColumn("event_type", F.lit("synthetic"))
        .withColumn("event_date", F.lit("2040-01-01"))
    )
    merge_into_versioned(spark, root, syn, ["event_id"], "event_date")
    delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "error"
    )
    v = refresh_value_index(spark, idx)
    assert v == read_manifest(root)["version"]

    # exact: the synthetic user's one-partition home, nothing else
    assert index_lookup_partitions(spark, idx, syn_user) == {"2040-01-01"}

    # per-user invariant: index n-sums equal the table's true counts,
    # including users whose rows the delete removed entirely
    snap = read_snapshot(spark, root, "event_date")
    idx_sums = {
        r["value"]: r["s"]
        for r in read_snapshot(spark, idx, "bucket")
        .groupBy("value")
        .agg(F.sum("n").alias("s"))
        .collect()
    }
    true_sums = {
        r["user_id"]: r["c"]
        for r in snap.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert idx_sums == true_sums

    # crash-replay idempotence: rewind the cursor and re-apply the span
    from datalake2anomali_spark.io.index import _follower, _meta

    fol = _follower(idx, _meta(idx))
    before = sorted(
        tuple(r)
        for r in read_snapshot(spark, idx, "bucket")
        .select("value", "partition", "n")
        .collect()
    )
    fol.commit(1)  # pretend the post-apply cursor write was lost
    refresh_value_index(spark, idx)
    after = sorted(
        tuple(r)
        for r in read_snapshot(spark, idx, "bucket")
        .select("value", "partition", "n")
        .collect()
    )
    assert before == after

    # caught-up refresh is a no-op
    assert refresh_value_index(spark, idx) == read_manifest(root)["version"]


def test_indexed_read_stale_refusal_and_autorefresh(spark, sf_dir, tmp_path):
    root, idx, e = _setup(spark, sf_dir, tmp_path)
    u = e.agg(F.min("user_id")).collect()[0][0]
    delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "view"
    )
    with pytest.raises(ValueError, match="reflects v"):
        indexed_read(spark, idx, u, refresh=False)
    got = indexed_read(spark, idx, u)  # auto-refresh path
    want = read_snapshot(spark, root, "event_date").filter(
        F.col("user_id") == u
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_index_rename_replay_after_crash_is_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r10 (high): a crash AFTER _follow_renames persisted the
    renamed meta but BEFORE the follower cursor advanced must replay
    cleanly.  Before the fix, the replayed rename event's 'to' name was
    already tracked, so refresh spuriously raised the reuse refusal and
    permanently bricked the index; the persisted ``schema_through``
    watermark now skips already-reflected events."""
    from datalake2anomali_spark.io.index import _follow_renames, _meta
    from datalake2anomali_spark.io.publish import alter_table_columns

    root, idx, e = _setup(spark, sf_dir, tmp_path)
    alter_table_columns(root, rename={"user_id": "uid"})
    delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "error"
    )

    # crash window: names followed + persisted, cursor NOT advanced
    meta = _follow_renames(idx, _meta(idx))
    assert meta["col"] == "uid"
    assert meta["schema_through"] == read_manifest(root)["version"]

    # replay (the retried refresh) must not raise and must land exactly
    v = refresh_value_index(spark, idx)
    assert v == read_manifest(root)["version"]
    u = int(e.agg(F.min("user_id")).collect()[0][0])
    want = {
        r["event_date"]
        for r in e.filter(
            (F.col("user_id") == u) & (F.col("event_type") != "error")
        ).select("event_date").distinct().collect()
    }
    assert index_lookup_partitions(spark, idx, u) == want

    # a LATER genuine identity break is still refused loudly
    alter_table_columns(root, drop=["uid"])
    alter_table_columns(root, add=[("uid", "bigint")])
    with pytest.raises(ValueError, match="dropped and re-added"):
        refresh_value_index(spark, idx)
