"""Metadata-only column evolution (io/publish.py: alter_table_columns):
add/drop/rename with zero rewrite, mixed old/new piece reads, stats and
bloom key remapping, name-reuse after drop, time travel to pre-alter
names, and the refusal matrix."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    alter_table_columns,
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


def _n_parquet(root):
    return sum(
        1
        for _d, _dn, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def test_alter_columns_metadata_only_mixed_pieces(spark, sf_dir, tmp_path):
    root = str(tmp_path / "alter")
    e = _events(spark, sf_dir)
    init_table(
        spark, e, root, "event_date",
        stats_cols=["value"], bloom_cols=["event_type"],
    )
    n_files = _n_parquet(root)
    v1 = read_manifest(root)["version"]

    alter_table_columns(
        root,
        add=[("score", "double")],
        drop=["props"],
        rename={"value": "amount"},
    )
    assert _n_parquet(root) == n_files  # zero data rewritten
    m = read_manifest(root)
    assert m["operation"].startswith("alter(")
    assert [n for n, _t in m["schema"]] == [
        "event_id", "ts", "user_id", "event_type", "amount", "event_date",
        "score",
    ]

    snap = read_snapshot(spark, root, "event_date")
    assert snap.columns == [
        "event_id", "ts", "user_id", "event_type", "amount", "event_date",
        "score",
    ]
    # renamed column carries the old values; added column reads NULL
    assert snap.filter(F.col("score").isNotNull()).count() == 0
    want_sum = e.agg(F.sum("value")).collect()[0][0]
    got_sum = snap.agg(F.sum("amount")).collect()[0][0]
    assert abs(got_sum - want_sum) < 1e-6

    # zone maps followed the rename: a range read on `amount` works
    hi = snap.agg(F.max("amount")).collect()[0][0]
    ranged = read_snapshot(
        spark, root, "event_date", predicate=("amount", hi, hi)
    )
    assert ranged.count() == snap.filter(F.col("amount") == hi).count() > 0
    # bloom keys survived untouched columns
    probed = read_snapshot(
        spark, root, "event_date", eq_predicate=("event_type", "click")
    )
    assert probed.count() == snap.filter(F.col("event_type") == "click").count()

    # mixed pieces: a post-alter merge writes the NEW physical names
    fresh = (
        snap.limit(0)
        .unionByName(
            snap.filter(F.col("event_type") == "purchase")
            .withColumn("event_id", F.col("event_id") + 55_000_000)
            .withColumn("amount", F.lit(123.0))
            .withColumn("score", F.lit(0.5))
        )
    )
    merge_into_versioned(spark, root, fresh, ["event_id"], "event_date")
    after = read_snapshot(spark, root, "event_date")
    new_rows = after.filter(F.col("event_id") >= 55_000_000)
    assert new_rows.filter(F.col("score") != 0.5).count() == 0
    assert new_rows.filter(F.col("amount") != 123.0).count() == 0
    old_rows = after.filter(F.col("event_id") < 55_000_000)
    assert old_rows.filter(F.col("score").isNotNull()).count() == 0
    assert after.count() == e.count() + fresh.count()

    # time travel to the pre-alter snapshot shows the ORIGINAL columns
    old_snap = read_snapshot(spark, root, "event_date", version=v1)
    assert "value" in old_snap.columns and "props" in old_snap.columns
    assert "amount" not in old_snap.columns


def test_alter_name_reuse_after_drop(spark, sf_dir, tmp_path):
    """Drop X then rename Y -> X: old pieces physically hold BOTH; the
    stale X is shadowed and Y's values surface under the reused name."""
    root = str(tmp_path / "reuse")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    alter_table_columns(root, drop=["props"])
    alter_table_columns(root, rename={"value": "props"})
    snap = read_snapshot(spark, root, "event_date")
    assert dict(snap.dtypes)["props"] == "double"  # value's type, not varchar
    want = e.agg(F.sum("value")).collect()[0][0]
    got = snap.agg(F.sum("props")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_alter_refusals(spark, sf_dir, tmp_path):
    root = str(tmp_path / "ref")
    e = _events(spark, sf_dir)
    init_table(
        spark, e, root, "event_date",
        constraints={"value_nonneg": "value >= 0 OR value IS NULL"},
    )
    with pytest.raises(ValueError, match="unknown column"):
        alter_table_columns(root, drop=["nope"])
    with pytest.raises(ValueError, match="unknown column"):
        alter_table_columns(root, rename={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        alter_table_columns(root, rename={"value": "props"})
    with pytest.raises(ValueError, match="existing column"):
        alter_table_columns(root, add=[("value", "double")])
    with pytest.raises(ValueError, match="nothing to alter"):
        alter_table_columns(root)
    # constraint-referenced column is frozen
    with pytest.raises(ValueError, match="constraints"):
        alter_table_columns(root, drop=["value"])
    with pytest.raises(ValueError, match="constraints"):
        alter_table_columns(root, rename={"value": "amount"})
    v = read_manifest(root)["version"]
    # deletion-vector key column is frozen
    delete_from_versioned(
        spark, root, "event_date",
        F.col("event_type") == "error",
        mode="merge_on_read", key_cols=["event_id"],
    )
    with pytest.raises(ValueError, match="deletion vectors"):
        alter_table_columns(root, rename={"event_id": "eid"})
    assert read_manifest(root)["version"] == v + 1  # only the delete landed


def test_alter_readd_does_not_resurrect_dropped_bytes(spark, sf_dir, tmp_path):
    """DROP then ADD of the same name: never-rewritten pieces physically
    hold the old column, but the re-added column must read NULL — the
    add log shadows the stale bytes."""
    root = str(tmp_path / "readd")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    alter_table_columns(root, drop=["props"])
    alter_table_columns(root, add=[("props", "string")])
    snap = read_snapshot(spark, root, "event_date")
    assert snap.filter(F.col("props").isNotNull()).count() == 0
    assert snap.count() == e.count()
    # a post-re-add write's real values DO surface
    fresh = (
        snap.filter(F.col("event_type") == "signup")
        .withColumn("event_id", F.col("event_id") + 56_000_000)
        .withColumn("props", F.lit("fresh"))
    )
    merge_into_versioned(spark, root, fresh, ["event_id"], "event_date")
    after = read_snapshot(spark, root, "event_date")
    assert after.filter(F.col("props") == "fresh").count() == fresh.count()
    assert (
        after.filter(
            (F.col("event_id") < 56_000_000) & F.col("props").isNotNull()
        ).count()
        == 0
    )


def test_schema_evolution_merge_does_not_resurrect_dropped_bytes(
    spark, sf_dir, tmp_path
):
    """Re-adding a dropped column through merge(allow_schema_evolution)
    — not through alter — must also shadow the stale physical bytes in
    never-rewritten pieces."""
    root = str(tmp_path / "evoreadd")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    alter_table_columns(root, drop=["props"])
    # pieces for most partitions still physically hold `props`; the
    # evolution merge rewrites ONLY the error rows' partitions... use a
    # single-date source so bystander partitions stay old
    d = e.agg(F.min("event_date")).collect()[0][0]
    src = (
        e.filter(F.col("event_date") == d)
        .drop("props")
        .withColumn("event_id", F.col("event_id") + 57_000_000)
        .withColumn("props", F.lit("evolved"))
    )
    merge_into_versioned(
        spark, root, src, ["event_id"], "event_date",
        allow_schema_evolution=True,
    )
    snap = read_snapshot(spark, root, "event_date")
    assert snap.filter(F.col("props") == "evolved").count() == src.count()
    # untouched partitions' stale physical props reads NULL, not old data
    assert (
        snap.filter(
            (F.col("event_id") < 57_000_000) & F.col("props").isNotNull()
        ).count()
        == 0
    )
