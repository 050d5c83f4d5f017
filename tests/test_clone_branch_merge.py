"""Shallow clone (zero-copy divergence, fallback-chain reads,
materialize-on-compact) and three-way branch merge (disjoint assembly,
partition conflicts, metadata conflicts)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    MergeConflictError,
    clone_table,
    compact_versioned,
    create_branch,
    delete_from_versioned,
    init_table,
    merge_branch,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
)
from datalake2anomali_spark.io.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )


def _fp(spark, root):
    df = read_snapshot(spark, root, "event_date")
    return (
        df.count(),
        df.agg(F.sum(F.hash(*sorted(df.columns))).alias("h")).collect()[0]["h"],
    )


def test_shallow_clone_divergence_and_materialize(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    e = _events(spark, sf_dir)
    init_table(spark, e, src, "event_date")

    clone_table(src, dst)
    # zero-copy: the clone root holds NO parquet at all
    assert not any(
        f.endswith(".parquet") for _d, _dn, fs in os.walk(dst) for f in fs
    )
    assert _fp(spark, dst) == _fp(spark, src)
    with pytest.raises(FileExistsError):
        clone_table(src, dst)

    # clone writes diverge locally; source never moves
    fp_src = _fp(spark, src)
    delete_from_versioned(
        spark, dst, "event_date", F.col("event_type") == "click"
    )
    assert _fp(spark, src) == fp_src
    assert (
        read_snapshot(spark, dst, "event_date")
        .filter(F.col("event_type") == "click")
        .count()
        == 0
    )
    # source writes don't leak into the clone
    fp_dst = _fp(spark, dst)
    syn = e.limit(0)  # schema-only; use a real batch below
    syn = (
        e.filter(F.col("event_id") % 501 == 0)
        .withColumn("event_id", F.col("event_id") + 60_000_000)
    )
    merge_into_versioned(spark, src, syn, ["event_id"], "event_date")
    assert _fp(spark, dst) == fp_dst

    # clone-of-clone resolves through the fallback chain
    dst2 = str(tmp_path / "dst2")
    clone_table(dst, dst2)
    assert read_manifest(dst2)["fallback_roots"] == [
        os.path.abspath(dst),
        os.path.abspath(src),
    ]
    assert _fp(spark, dst2) == fp_dst

    # compaction materializes: fallback chain drops, content identical
    compact_versioned(spark, dst, "event_date", "event_id")
    m = read_manifest(dst)
    assert "fallback_roots" not in m
    assert _fp(spark, dst) == fp_dst
    assert any(
        f.endswith(".parquet") for _d, _dn, fs in os.walk(dst) for f in fs
    )


def test_merge_branch_disjoint_sides(spark, sf_dir, tmp_path):
    """Branch deletes one date (merge-on-read), main merges rows into a
    brand-new date; the three-way merge publishes BOTH effects in one
    main commit."""
    root = str(tmp_path / "mb")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    dates = sorted(
        r[0] for r in e.select("event_date").distinct().collect()
    )
    victim = dates[0]

    create_branch(root, "work")
    delete_from_versioned(
        spark, root, "event_date",
        F.col("event_date") == victim,
        ref="work", mode="merge_on_read", key_cols=["event_id"],
    )
    syn = (
        e.filter(F.col("event_id") % 301 == 0)
        .withColumn("event_id", F.col("event_id") + 61_000_000)
        .withColumn("event_date", F.lit("2042-03-01"))
    )
    merge_into_versioned(spark, root, syn, ["event_id"], "event_date")
    n_main = read_snapshot(spark, root, "event_date").count()

    v = merge_branch(root, "work")
    m = read_manifest(root)
    assert m["version"] == v
    assert m["operation"].startswith("merge_branch(work@")
    snap = read_snapshot(spark, root, "event_date")
    assert snap.filter(F.col("event_date") == victim).count() == 0
    assert snap.filter(F.col("event_date") == "2042-03-01").count() == syn.count()
    assert snap.count() == n_main - e.filter(F.col("event_date") == victim).count()
    # the branch's merge-on-read vectors carried into main's manifest
    assert victim in m.get("dv", {}).get("files", {})


def test_merge_branch_conflicts_and_trivial(spark, sf_dir, tmp_path):
    root = str(tmp_path / "mbc")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    dates = sorted(r[0] for r in e.select("event_date").distinct().collect())

    # trivial path: main unmoved -> behaves as fast_forward
    create_branch(root, "solo")
    delete_from_versioned(
        spark, root, "event_date",
        F.col("event_date") == dates[0], ref="solo",
    )
    v = merge_branch(root, "solo")
    assert read_manifest(root)["version"] == v
    assert (
        read_snapshot(spark, root, "event_date")
        .filter(F.col("event_date") == dates[0])
        .count()
        == 0
    )

    # partition conflict: both sides touch the same date
    create_branch(root, "clash")
    delete_from_versioned(
        spark, root, "event_date",
        (F.col("event_date") == dates[1]) & (F.col("event_type") == "click"),
        ref="clash",
    )
    delete_from_versioned(
        spark, root, "event_date",
        (F.col("event_date") == dates[1]) & (F.col("event_type") == "view"),
    )
    with pytest.raises(MergeConflictError, match="both changed partitions"):
        merge_branch(root, "clash")

    # schema conflict: both sides widen differently
    create_branch(root, "widen")
    merge_into_versioned(
        spark, root,
        e.filter(F.col("event_date") == dates[2]).withColumn(
            "b_col", F.lit(1)
        ),
        ["event_id"], "event_date", ref="widen",
        allow_schema_evolution=True,
    )
    merge_into_versioned(
        spark, root,
        e.filter(F.col("event_date") == dates[3]).withColumn(
            "m_col", F.lit(2)
        ),
        ["event_id"], "event_date",
        allow_schema_evolution=True,
    )
    with pytest.raises(MergeConflictError, match="schema"):
        merge_branch(root, "widen")


def test_clone_version_counter_never_collides(spark, sf_dir, tmp_path):
    """The clone's first claims must start PAST the source's version
    numbers: a partition-scoped write on a fresh clone advances the
    version forward and never shadows a fallback directory that still
    owns untouched partitions."""
    src = str(tmp_path / "vsrc")
    dst = str(tmp_path / "vdst")
    e = _events(spark, sf_dir)
    init_table(spark, e, src, "event_date")
    # advance src to v2+ so the clone references several version numbers
    merge_into_versioned(
        spark, src,
        e.filter(F.col("event_type") == "signup").withColumn(
            "value", F.col("value") + 1
        ),
        ["event_id"], "event_date",
    )
    src_v = read_manifest(src)["version"]
    assert src_v >= 2
    clone_table(src, dst)

    dates = sorted(r[0] for r in e.select("event_date").distinct().collect())
    # two partition-scoped writes: most partitions stay fallback-owned
    for d in dates[:2]:
        v = delete_from_versioned(
            spark, dst, "event_date",
            (F.col("event_date") == d) & (F.col("event_type") == "click"),
        )
        assert v > src_v  # forward, never reusing a referenced number
    got = read_snapshot(spark, dst, "event_date")
    want_gone = read_snapshot(spark, src, "event_date").filter(
        F.col("event_date").isin(dates[:2]) & (F.col("event_type") == "click")
    )
    assert got.count() == read_snapshot(spark, src, "event_date").count() - want_gone.count()
    # untouched partitions still resolve through the fallback chain
    assert (
        got.filter(F.col("event_date") == dates[3]).count()
        == read_snapshot(spark, src, "event_date")
        .filter(F.col("event_date") == dates[3])
        .count()
        > 0
    )


def test_merge_branch_metadata_vs_data_conflict(spark, sf_dir, tmp_path):
    """A rename on one fork conflicts with ANY data write on the other:
    the concurrently written pieces carry version numbers above the
    rename without having seen it, so replaying by version would map
    their physical names wrongly."""
    from datalake2anomali_spark.io.publish import alter_table_columns

    root = str(tmp_path / "mvd")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_branch(root, "ren")
    alter_table_columns(root, rename={"value": "amount"}, ref="ren")
    merge_into_versioned(
        spark, root,
        e.filter(F.col("event_type") == "error").withColumn(
            "event_id", F.col("event_id") + 62_000_000
        ),
        ["event_id"], "event_date",
    )
    with pytest.raises(MergeConflictError, match="metadata"):
        merge_branch(root, "ren")


def test_merge_branch_drops_geometry_mismatched_blooms(spark, tmp_path):
    """Canonical WAP flow that crosses a compaction: branch adds a new
    partition at the fork-time bloom geometry while main compacts to a
    larger m.  The disjoint merge must NOT carry the branch partition's
    1024-bit bitmap into a manifest recording the larger geometry —
    probing it there yields near-certain false negatives and
    read_snapshot would silently drop the partition's rows (ADVICE r14).
    A dropped bloom merely disables skipping, which is always safe."""
    root = str(tmp_path / "mb_geo")
    small = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    init_table(spark, small, root, "p", bloom_cols=["k"])
    assert read_manifest(root)["bloom_geometry"] == {"m": 1024, "k": 3}

    create_branch(root, "work")
    # branch: brand-new partition, bitmaps built at the fork geometry
    branch_rows = spark.range(50_000, 50_040).select(
        F.col("id").alias("k"), F.lit("9").alias("p")
    )
    merge_into_versioned(spark, root, branch_rows, ["k"], "p", ref="work")

    # main: grow two orders of magnitude, then compact — the one
    # sanctioned geometry re-choice point
    big = spark.range(1000, 11000).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    merge_into_versioned(spark, root, big, ["k"], "p")
    compact_versioned(spark, root, "p", order_col="k")
    assert read_manifest(root)["bloom_geometry"]["m"] == 65536

    merge_branch(root, "work")
    m = read_manifest(root)
    assert m["bloom_geometry"]["m"] == 65536
    # main partitions keep their (matching-geometry) bitmaps; the branch
    # partition's fork-geometry bitmap is dropped, not carried
    assert "0" in m["bloom"] and "1" in m["bloom"]
    assert "9" not in m.get("bloom", {})
    # and the branch partition's rows are actually findable via the
    # bloom-consulting point-lookup path
    hit = read_snapshot(spark, root, "p", eq_predicate=("k", 50_011))
    assert hit.count() == 1
    assert read_snapshot(spark, root, "p").filter(F.col("p") == "9").count() == 40
