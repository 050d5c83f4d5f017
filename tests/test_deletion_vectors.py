"""Merge-on-read DELETE via deletion vectors (io/publish.py):
result-parity with copy-on-write, O(deleted) write footprint, vector
materialization on rewrite, re-insert correctness, metadata counts,
vacuum/restore protection, CDF visibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    compact_versioned,
    delete_from_versioned,
    init_table,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
    restore_version,
    snapshot_rowcount,
    table_changes,
    vacuum,
    version_dir,
)
from datalake2anomali_spark.io.tables import load_table


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )


@pytest.fixture()
def vtable(spark, events, tmp_path):
    root = str(tmp_path / "events_dv")
    init_table(spark, events, root, "event_date")
    return root


def _fp(spark, root, **kw):
    df = read_snapshot(spark, root, "event_date", **kw)
    return (
        df.count(),
        df.agg(F.sum(F.hash(*sorted(df.columns))).alias("h")).collect()[0]["h"],
    )


def test_mor_delete_matches_cow_and_writes_no_partitions(
    spark, events, vtable, tmp_path
):
    cond = (F.col("event_type") == "view") & (F.col("event_id") % 3 == 0)
    cow_root = str(tmp_path / "events_cow")
    init_table(spark, events, cow_root, "event_date")
    delete_from_versioned(spark, cow_root, "event_date", cond)

    v = delete_from_versioned(
        spark, vtable, "event_date", cond,
        mode="merge_on_read", key_cols=["event_id"],
    )
    assert _fp(spark, vtable) == _fp(spark, cow_root)  # identical results
    m = read_manifest(vtable)
    assert m["operation"] == "delete_mor"
    # no data partition changed owners: the commit wrote only vectors
    assert all(int(x) == 1 for x in m["partitions"].values())
    dvdir = os.path.join(version_dir(vtable, v), "_dv")
    assert os.path.isdir(dvdir)
    assert set(m["dv"]["files"]) <= set(m["partitions"])
    # metadata COUNT(*) = physical minus vectors
    assert snapshot_rowcount(vtable) == events.count() - events.filter(
        cond
    ).count()


def test_mor_delete_nothing_commits_nothing(spark, vtable):
    before = read_manifest(vtable)["version"]
    v = delete_from_versioned(
        spark, vtable, "event_date", F.lit(False),
        mode="merge_on_read", key_cols=["event_id"],
    )
    assert v == before


def test_rewrite_materializes_vectors_and_reinsert_survives(
    spark, events, vtable
):
    """A MERGE over a vector'd partition clears its vectors; a key
    re-inserted after its MoR delete must be visible (a stale vector
    must not re-delete it)."""
    victim = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "event_date"
    ).first()
    delete_from_versioned(
        spark, vtable, "event_date",
        F.col("event_id") == victim["event_id"],
        mode="merge_on_read", key_cols=["event_id"],
    )
    assert read_snapshot(spark, vtable, "event_date").filter(
        F.col("event_id") == victim["event_id"]
    ).count() == 0

    # re-insert the same key into the same partition via MERGE
    row = events.filter(F.col("event_id") == victim["event_id"]).withColumn(
        "value", F.lit(123.0)
    )
    merge_into_versioned(spark, vtable, row, ["event_id"], "event_date")
    m = read_manifest(vtable)
    assert victim["event_date"] not in m.get("dv", {}).get("files", {})
    got = read_snapshot(spark, vtable, "event_date").filter(
        F.col("event_id") == victim["event_id"]
    ).collect()
    assert len(got) == 1 and got[0]["value"] == 123.0


def test_multi_partition_vector_file_reinsert_survives_partial_rewrite(
    spark, events, vtable
):
    """One MoR DELETE commit writes ONE vector file spanning several
    partitions; a later MERGE rewrites only one of them.  _carry_dv drops
    that partition from dv['files'] but the shared file stays referenced
    by the untouched partitions — the reader must not apply its stale
    tuples for the rewritten partition (ADVICE r8 high)."""
    victims = (
        events.filter(F.col("event_type") == "purchase")
        .select("event_id", "event_date")
        .dropDuplicates(["event_date"])
        .limit(2)
        .collect()
    )
    assert len(victims) == 2 and victims[0]["event_date"] != victims[1]["event_date"]
    ids = [r["event_id"] for r in victims]
    # one delete commit → one DV file covering BOTH partitions
    delete_from_versioned(
        spark, vtable, "event_date", F.col("event_id").isin(ids),
        mode="merge_on_read", key_cols=["event_id"],
    )
    m = read_manifest(vtable)
    assert set(m["dv"]["files"]) == {r["event_date"] for r in victims}

    # rewrite ONLY victim[0]'s partition, re-inserting its deleted key
    row = events.filter(F.col("event_id") == ids[0]).withColumn(
        "value", F.lit(321.0)
    )
    merge_into_versioned(spark, vtable, row, ["event_id"], "event_date")
    m2 = read_manifest(vtable)
    assert victims[0]["event_date"] not in m2["dv"]["files"]
    assert victims[1]["event_date"] in m2["dv"]["files"]  # file still referenced

    snap = read_snapshot(spark, vtable, "event_date")
    got = snap.filter(F.col("event_id") == ids[0]).collect()
    assert len(got) == 1 and got[0]["value"] == 321.0  # stale tuple must not apply
    assert snap.filter(F.col("event_id") == ids[1]).count() == 0  # live tuple does


def test_stacked_vectors_and_compaction_clears_all(spark, events, vtable):
    delete_from_versioned(
        spark, vtable, "event_date", F.col("event_type") == "view",
        mode="merge_on_read", key_cols=["event_id"],
    )
    delete_from_versioned(
        spark, vtable, "event_date",
        (F.col("event_type") == "signup") & (F.col("event_id") % 2 == 0),
        mode="merge_on_read", key_cols=["event_id"],
    )
    want = events.filter(
        ~(
            (F.col("event_type") == "view")
            | ((F.col("event_type") == "signup") & (F.col("event_id") % 2 == 0))
        )
    )
    snap = read_snapshot(spark, vtable, "event_date")
    assert snap.count() == want.count()
    assert snapshot_rowcount(vtable) == want.count()

    before = _fp(spark, vtable)
    compact_versioned(spark, vtable, "event_date", "event_id")
    assert _fp(spark, vtable) == before  # content preserved
    assert "dv" not in read_manifest(vtable)  # vectors materialized
    assert snapshot_rowcount(vtable) == want.count()


def test_vacuum_protects_vectors_and_restore_revives_them(
    spark, events, vtable
):
    v_del = delete_from_versioned(
        spark, vtable, "event_date", F.col("event_type") == "error",
        mode="merge_on_read", key_cols=["event_id"],
    )
    after_del = _fp(spark, vtable)
    # advance with an insert confined to one NEW partition, so the
    # standing vectors survive the rewrite (only that partition rewrote)
    ins = events.filter(F.col("event_type") == "error").withColumn(
        "event_id", F.col("event_id") + 44_000_000
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 40 DAY"))
    ins = ins.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
    v_ins = merge_into_versioned(spark, vtable, ins, ["event_id"], "event_date")
    assert read_manifest(vtable).get("dv")  # vectors still live
    assert _fp(spark, vtable)[0] == after_del[0] + ins.count()

    # restore to the delete commit revives its vector'd state exactly
    # (within the retention window — restore after a hard vacuum of the
    # history is correctly refused, tested for plain versions elsewhere)
    v_back = restore_version(vtable, v_del)
    assert v_back > v_del
    assert _fp(spark, vtable) == after_del

    removed = vacuum(vtable, retain_last=1, claim_ttl_seconds=0.0)
    # the restored snapshot references v1's data AND v_del's vectors —
    # a hard vacuum reclaims only the rolled-back insert's directory
    assert removed == [v_ins]

    # once compaction materializes the deletions, the vector commit is
    # unreferenced and a vacuum reclaims it
    compact_versioned(spark, vtable, "event_date", "event_id")
    removed2 = vacuum(vtable, retain_last=1, claim_ttl_seconds=0.0)
    assert v_del in removed2
    assert not os.path.isdir(version_dir(vtable, v_del))
    assert _fp(spark, vtable) == after_del
    assert "dv" not in read_manifest(vtable)


def test_cdf_sees_mor_deletes_and_guards(spark, events, vtable):
    v1 = read_manifest(vtable)["version"]
    v2 = delete_from_versioned(
        spark, vtable, "event_date",
        (F.col("event_type") == "purchase") & (F.col("event_id") % 5 == 0),
        mode="merge_on_read", key_cols=["event_id"],
    )
    cdf = table_changes(spark, vtable, "event_date", ["event_id"], v1, v2)
    kinds = {r["change_type"] for r in cdf.select("change_type").distinct().collect()}
    assert kinds == {"removed"}
    assert cdf.count() == events.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 5 == 0)
    ).count()

    with pytest.raises(ValueError, match="requires key_cols"):
        delete_from_versioned(
            spark, vtable, "event_date", F.lit(True), mode="merge_on_read"
        )
    with pytest.raises(ValueError, match="keyed by"):
        delete_from_versioned(
            spark, vtable, "event_date", F.col("event_type") == "view",
            mode="merge_on_read", key_cols=["user_id"],
        )
    with pytest.raises(ValueError, match="unknown delete mode"):
        delete_from_versioned(
            spark, vtable, "event_date", F.lit(True), mode="bogus"
        )


def test_partitions_df_exposes_vector_counts(spark, events, vtable):
    from datalake2anomali_spark.io.publish import partitions_df

    cond = (F.col("event_type") == "view") & (F.col("event_id") % 4 == 0)
    delete_from_versioned(
        spark, vtable, "event_date", cond,
        mode="merge_on_read", key_cols=["event_id"],
    )
    p = partitions_df(spark, vtable)
    got = {r["partition"]: (r["n_rows"], r["n_deleted"]) for r in p.collect()}
    want_del = {
        str(r[0]): int(r[1])
        for r in events.filter(cond).groupBy("event_date").count().collect()
    }
    for part, (n_rows, n_deleted) in got.items():
        assert n_deleted == want_del.get(part, 0)
    # logical total = physical minus vectors, matching the actual read
    logical = sum(n - d for n, d in got.values())
    assert logical == read_snapshot(spark, vtable, "event_date").count()
