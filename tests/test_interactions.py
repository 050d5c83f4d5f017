"""Cross-feature interaction pins: the lakehouse surfaces that landed
separately (shallow clone, deletion vectors, merge-on-read UPDATE,
column renames, transactions) composed pairwise — the bug class the
review passes kept finding inside single features, pinned here across
feature boundaries so a regression in the shared read/commit paths
(`_resolve_vdir` fallback chains, `_apply_renames` replay,
`_carry_dv`/`_carry_appends`) fails loudly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    alter_table_columns,
    clone_table,
    compact_versioned,
    delete_from_versioned,
    init_table,
    read_manifest,
    read_snapshot,
    update_versioned,
)
from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.io.transaction import Transaction


def _events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .select("event_id", "user_id", "event_type", "value", "event_date")
    )


def test_clone_carries_and_stacks_deletion_vectors(spark, sf_dir, tmp_path):
    """A clone of a table with LIVE merge-on-read vectors reads them
    through the fallback chain; its own MoR deletes stack locally
    without leaking to the source; compaction materializes everything
    and drops the chain."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    e = _events(spark, sf_dir)
    init_table(spark, e, src, "event_date")
    delete_from_versioned(
        spark, src, "event_date", F.col("event_type") == "error",
        mode="merge_on_read", key_cols=["event_id"],
    )
    n_src = read_snapshot(spark, src, "event_date").count()
    clone_table(src, dst)
    assert read_snapshot(spark, dst, "event_date").count() == n_src

    delete_from_versioned(
        spark, dst, "event_date", F.col("event_type") == "click",
        mode="merge_on_read", key_cols=["event_id"],
    )
    d = read_snapshot(spark, dst, "event_date")
    exp = e.filter(~F.col("event_type").isin("error", "click")).count()
    assert d.filter(F.col("event_type") == "click").count() == 0
    assert d.count() == exp
    # source keeps its clicks (clone vectors are local)
    assert (
        read_snapshot(spark, src, "event_date")
        .filter(F.col("event_type") == "click")
        .count()
        > 0
    )

    compact_versioned(spark, dst, "event_date", "event_id")
    m = read_manifest(dst)
    assert not m.get("fallback_roots")
    assert read_snapshot(spark, dst, "event_date").count() == exp


def test_transaction_after_column_rename_replays_physical_names(
    spark, sf_dir, tmp_path
):
    """UPDATE/MERGE staged through a Transaction against a RENAMED
    column: old pieces still physically hold the old name and must
    replay the rename; the rewritten partitions come out under the new
    name with exact values."""
    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    alter_table_columns(root, rename={"value": "amount"})

    txn = Transaction(spark, root, "event_date")
    txn.update(F.col("event_type") == "click", {"amount": F.col("amount") * 2})
    src = (
        e.withColumnRenamed("value", "amount")
        .filter(F.col("event_type") == "purchase")
        .withColumn("amount", F.col("amount") + 1000)
    )
    txn.merge(src, ["event_id"])
    txn.commit()

    snap = read_snapshot(spark, root, "event_date")
    assert "amount" in snap.columns and "value" not in snap.columns
    got = snap.agg(
        F.sum(F.round(F.col("amount") * 100).cast("long"))
    ).collect()[0][0]
    want = (
        e.withColumn(
            "value",
            F.when(F.col("event_type") == "click", F.col("value") * 2)
            .when(F.col("event_type") == "purchase", F.col("value") + 1000)
            .otherwise(F.col("value")),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert got == want


def test_merge_on_read_update_on_clone_via_fallback_chain(
    spark, sf_dir, tmp_path
):
    """update_versioned(mode=merge_on_read) on a SHALLOW CLONE: the
    vector + append-delta land under the clone root while the
    pre-image pieces resolve through the fallback chain; the source
    stays untouched."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    e = _events(spark, sf_dir)
    init_table(spark, e, src, "event_date")
    clone_table(src, dst)
    update_versioned(
        spark, dst, "event_date",
        F.col("event_type") == "view", {"value": F.lit(0.0)},
        mode="merge_on_read", key_cols=["event_id"],
    )
    d = read_snapshot(spark, dst, "event_date")
    assert (
        d.filter(
            (F.col("event_type") == "view") & (F.col("value") != 0.0)
        ).count()
        == 0
    )
    assert d.count() == e.count()
    n_views = e.filter(F.col("event_type") == "view").count()
    assert (
        read_snapshot(spark, src, "event_date")
        .filter((F.col("event_type") == "view") & (F.col("value") == 0.0))
        .count()
        < n_views
    )


def test_table_changes_aligns_schema_evolution_in_span(
    spark, sf_dir, tmp_path
):
    """A CDF span crossing a rename + an add + a drop still diffs: the
    old snapshot aligns to the target's logical schema (renames replay,
    added columns NULL-fill, dropped columns leave), so followers
    survive schema evolution instead of refusing the whole span."""
    from datalake2anomali_spark.io.publish import (
        merge_into_versioned,
        table_changes,
    )

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    v0 = read_manifest(root)["version"]

    alter_table_columns(root, rename={"value": "amount"}, drop=["user_id"])
    d0 = e.agg(F.min("event_date")).collect()[0][0]
    src = (
        e.drop("user_id")
        .withColumnRenamed("value", "amount")
        .filter((F.col("event_date") == d0) & (F.col("event_type") == "click"))
        .withColumn("amount", F.col("amount") + 5)
        .withColumn("score", F.lit(1.5))
    )
    merge_into_versioned(
        spark, root, src, ["event_id"], "event_date",
        allow_schema_evolution=True,
    )
    v1 = read_manifest(root)["version"]

    ch = table_changes(spark, root, "event_date", ["event_id"], v0, v1)
    by_type = {r["change_type"]: r["n"] for r in
               ch.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    # only the merged rows changed (amount moved and score appeared);
    # the rename itself must NOT report every row as changed
    assert by_type.get("changed", 0) == src.count()
    assert "added" not in by_type and "removed" not in by_type
    # images carry the target schema's names
    chi = table_changes(
        spark, root, "event_date", ["event_id"], v0, v1, include_images=True
    )
    assert "pre_amount" in chi.columns and "post_score" in chi.columns
    row = chi.filter(F.col("change_type") == "changed").select(
        "pre_score", "post_score"
    ).first()
    assert row["pre_score"] is None and row["post_score"] == 1.5


def test_value_index_follows_column_renames(spark, sf_dir, tmp_path):
    """Renaming the indexed column (or unrelated columns) between
    refreshes must not break the index: the refresh follows the rename
    log from its cursor and keeps serving exact lookups; a drop+re-add
    of a tracked name is refused loudly (the identity is gone)."""
    import pytest

    from datalake2anomali_spark.io.index import (
        create_value_index,
        index_lookup_partitions,
        indexed_read,
        refresh_value_index,
    )

    root = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_value_index(spark, root, "event_date", "user_id", ["event_id"], idx)

    alter_table_columns(root, rename={"user_id": "uid", "value": "amount"})
    delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "error"
    )
    v = refresh_value_index(spark, idx)
    assert v == read_manifest(root)["version"]
    u = int(e.agg(F.min("user_id")).collect()[0][0])
    homes = index_lookup_partitions(spark, idx, u)
    want = {
        r["event_date"]
        for r in e.filter(
            (F.col("user_id") == u) & (F.col("event_type") != "error")
        ).select("event_date").distinct().collect()
    }
    assert homes == want
    out = indexed_read(spark, idx, u, refresh=False)
    assert "uid" in out.columns and "user_id" not in out.columns
    assert out.count() == e.filter(
        (F.col("user_id") == u) & (F.col("event_type") != "error")
    ).count()

    # drop + re-add the indexed name: identity broken, refusal is loud
    alter_table_columns(root, drop=["uid"])
    alter_table_columns(root, add=[("uid", "bigint")])
    with pytest.raises(ValueError, match="dropped and re-added"):
        refresh_value_index(spark, idx)


def test_partition_column_rename_maps_mixed_directory_names(
    spark, sf_dir, tmp_path
):
    """Renaming the PARTITION column: pieces written before the rename
    keep their ``event_date=...`` hive directories, pieces written after
    use ``day=...``, and the rename replay unifies both under the new
    logical name; partition-value pruning stays name-independent."""
    from datalake2anomali_spark.io.publish import merge_into_versioned

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    alter_table_columns(root, rename={"event_date": "day"})
    assert read_snapshot(spark, root, "day").count() == e.count()

    # a write AFTER the rename creates day=... directories next to the
    # old event_date=... ones
    src = (
        e.withColumnRenamed("event_date", "day")
        .filter(F.col("event_type") == "purchase")
        .withColumn("value", F.col("value") + 1)
    )
    merge_into_versioned(spark, root, src, ["event_id"], "day")
    snap = read_snapshot(spark, root, "day")
    assert snap.count() == e.count()
    assert "day" in snap.columns and "event_date" not in snap.columns
    got = snap.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0][0]
    want = (
        e.withColumn(
            "value",
            F.when(
                F.col("event_type") == "purchase", F.col("value") + 1
            ).otherwise(F.col("value")),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert got == want
    # value-based pruning is partition-NAME independent
    d0 = e.agg(F.min("event_date")).collect()[0][0]
    pruned = read_snapshot(
        spark, root, "day", partition_filter=lambda p: p == d0
    )
    assert pruned.count() == e.filter(F.col("event_date") == d0).count()


def test_branch_alter_isolated_until_fast_forward(spark, sf_dir, tmp_path):
    """A column rename committed on a BRANCH leaves main's schema
    untouched until fast_forward publishes it — write-audit-publish for
    schema changes, with exact value preservation across the publish."""
    from datalake2anomali_spark.io.publish import create_branch, fast_forward

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_branch(root, "audit")
    alter_table_columns(root, rename={"value": "amount"}, ref="audit")
    assert "value" in read_snapshot(spark, root, "event_date").columns
    assert (
        "amount"
        in read_snapshot(spark, root, "event_date", ref="audit").columns
    )
    fast_forward(root, "audit")
    post = read_snapshot(spark, root, "event_date")
    assert "amount" in post.columns and "value" not in post.columns
    got = post.agg(
        F.sum(F.round(F.col("amount") * 100).cast("long"))
    ).collect()[0][0]
    want = e.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0][0]
    assert got == want


def test_cdc_apply_composes_with_widened_schema(spark, sf_dir, tmp_path):
    """cdc_apply_versioned onto a table widened by an evolution merge:
    the ops frame carries the widened schema and applies cleanly."""
    from datalake2anomali_spark.io.publish import (
        cdc_apply_versioned,
        merge_into_versioned,
    )

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    merge_into_versioned(
        spark,
        root,
        e.filter(F.col("event_type") == "purchase").withColumn(
            "score", F.col("value") / 10
        ),
        ["event_id"],
        "event_date",
        allow_schema_evolution=True,
    )
    # deterministic subset: cdc_apply_versioned evaluates the ops frame
    # in several separate actions, so a limit() could pick different rows
    # per evaluation and corrupt the ownership set
    touched = e.filter(
        (F.col("event_type") == "click") & (F.col("event_id") % 7 == 0)
    )
    ops = (
        touched.withColumn("score", F.lit(None).cast("double"))
        .withColumn("value", F.col("value") * 7)
        .withColumn("_op", F.lit("upsert"))
    )
    cdc_apply_versioned(spark, root, ops, ["event_id"], "event_date")
    snap = read_snapshot(spark, root, "event_date")
    assert snap.count() == e.count()
    # the upserts actually landed: touched keys carry value*7 and NULL
    # score, and their pre-update values are gone
    got = snap.join(touched.select("event_id", F.col("value").alias("pre")),
                    "event_id")
    n_touched = touched.count()
    assert n_touched > 0
    assert got.filter(
        (F.col("value") == F.col("pre") * 7) & F.col("score").isNull()
    ).count() == n_touched


def test_value_index_refuses_rename_into_tracked_name(
    spark, sf_dir, tmp_path
):
    """Drop the indexed column and rename ANOTHER column onto its name
    in one commit (legal: drop applies before rename): the tracked
    identity is gone and refresh must refuse loudly — silently following
    the impostor made lookups return empty for live values."""
    import pytest

    from datalake2anomali_spark.io.index import (
        create_value_index,
        refresh_value_index,
    )

    root = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_value_index(spark, root, "event_date", "user_id", ["event_id"], idx)
    alter_table_columns(
        root, drop=["user_id"], rename={"event_id": "user_id"}
    )
    with pytest.raises(ValueError, match="renamed onto its name"):
        refresh_value_index(spark, idx)


def test_table_changes_aligns_same_shape_drop_readd(spark, sf_dir, tmp_path):
    """Drop + re-add of a column leaves the two snapshots' column lists
    IDENTICAL while the old side still carries the dead column's values;
    the span-event check must trigger alignment anyway, or every row
    reports changed against pre-images of a dead identity."""
    from datalake2anomali_spark.io.publish import (
        merge_into_versioned,
        table_changes,
    )

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    v0 = read_manifest(root)["version"]

    alter_table_columns(root, drop=["value"])
    alter_table_columns(root, add=[("value", "double")])
    d0 = e.agg(F.min("event_date")).collect()[0][0]
    src = (
        e.filter((F.col("event_date") == d0) & (F.col("event_type") == "click"))
        .withColumn("value", F.lit(42.0))
    )
    merge_into_versioned(spark, root, src, ["event_id"], "event_date")
    v1 = read_manifest(root)["version"]

    ch = table_changes(spark, root, "event_date", ["event_id"], v0, v1,
                       include_images=True)
    changed = ch.filter(F.col("change_type") == "changed")
    # ONLY the merged rows changed — not every row that once had a value
    assert changed.count() == src.count()
    row = changed.select("pre_value", "post_value").first()
    assert row["pre_value"] is None and row["post_value"] == 42.0


def test_clone_of_hidden_table_carries_the_spec(spark, sf_dir, tmp_path):
    """Cloning a hidden-partitioned table must carry the transform spec
    sidecar: without it every read_hidden/merge_into_hidden on the clone
    died on a missing _PARTITION_SPEC.json.  The copy is clone-time
    state — later spec evolution on either side stays independent."""
    from datalake2anomali_spark.io.hidden import (
        evolve_partition_spec,
        init_hidden_table,
        merge_into_hidden,
        read_hidden,
        read_spec,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    init_hidden_table(spark, e, src, ["days", "ts"])
    clone_table(src, dst)

    assert read_hidden(spark, dst).count() == e.count()
    upd = e.filter(F.col("event_id") % 11 == 0).withColumn(
        "value", F.col("value") + 1000
    )
    merge_into_hidden(spark, dst, upd, ["event_id"])
    assert (
        read_hidden(spark, dst).filter(F.col("value") >= 1000).count()
        == upd.count()
    )
    assert (
        read_hidden(spark, src).filter(F.col("value") >= 1000).count() == 0
    )
    # spec evolution on the clone does not leak to the source
    evolve_partition_spec(dst, ["bucket", 8, "event_id"])
    assert read_spec(src) == ["days", "ts"]


def test_follower_behind_vacuum_window_fails_loud(spark, sf_dir, tmp_path):
    """A follower whose cursor fell behind the vacuum retention window
    must fail LOUDLY on poll — never return a silent partial diff.  The
    documented contract: retain_last must cover the polling lag."""
    import pytest

    from datalake2anomali_spark.io.publish import TableFollower, vacuum

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    fol = TableFollower(root, "event_date", ["event_id"], str(tmp_path / "c"))
    changes, v = fol.poll(spark)
    assert changes is not None  # bootstrap
    fol.commit(v)

    for t in ("error", "view", "signup"):
        delete_from_versioned(
            spark, root, "event_date", F.col("event_type") == t
        )
    vacuum(root, retain_last=1, claim_ttl_seconds=0.0)
    with pytest.raises(Exception):
        ch, tv = fol.poll(spark)
        # reaching here means poll returned; force plan execution so a
        # lazily-failing read still surfaces before any consumer commits
        if ch is not None:
            ch.count()


def test_transaction_rewrite_materializes_live_vectors(
    spark, sf_dir, tmp_path
):
    """A Transaction whose rewrite touches partitions carrying LIVE
    deletion vectors must materialize them (deleted rows stay deleted
    after the partitions rewrite under the txn's version)."""
    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "error",
        mode="merge_on_read", key_cols=["event_id"],
    )
    txn = Transaction(spark, root, "event_date")
    txn.update(F.col("event_type") == "click", {"value": F.col("value") * 3})
    txn.delete(F.col("event_type") == "signup")
    txn.commit()
    snap = read_snapshot(spark, root, "event_date")
    assert snap.filter(F.col("event_type") == "error").count() == 0
    assert snap.count() == e.filter(
        ~F.col("event_type").isin("error", "signup")
    ).count()


def test_cdf_and_index_span_crossing_partition_column_rename(
    spark, sf_dir, tmp_path
):
    """ADVICE r10 (medium): a CDF span crossing a PARTITION-column
    rename used to read the old snapshot with v_to's name and throw
    UNRESOLVED_COLUMN, permanently wedging any follower. table_changes
    now derives v_from's name by replaying the span renames backwards;
    the value-index follower (which feeds the renamed name into the
    span) must cross it too."""
    from datalake2anomali_spark.io.index import (
        create_value_index,
        index_lookup_partitions,
        refresh_value_index,
    )
    from datalake2anomali_spark.io.publish import table_changes

    root = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    e = _events(spark, sf_dir)
    init_table(spark, e, root, "event_date")
    create_value_index(spark, root, "event_date", "user_id", ["event_id"], idx)
    v0 = read_manifest(root)["version"]

    alter_table_columns(root, rename={"event_date": "day"})
    delete_from_versioned(
        spark, root, "day", F.col("event_type") == "error"
    )
    v1 = read_manifest(root)["version"]

    # direct CDF span across the partition-column rename: deletes
    # surface, the rename itself reports nothing
    ch = table_changes(spark, root, "day", ["event_id"], v0, v1)
    by = {
        r["change_type"]: r["n"]
        for r in ch.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by.get("removed", 0) == e.filter(
        F.col("event_type") == "error"
    ).count()
    assert "added" not in by and "changed" not in by
    # images carry the TARGET schema's partition-column name
    chi = table_changes(
        spark, root, "day", ["event_id"], v0, v1, include_images=True
    )
    assert "pre_day" in chi.columns and "pre_event_date" not in chi.columns

    # the index follower crosses the same span end-to-end
    assert refresh_value_index(spark, idx) == v1
    u = int(e.agg(F.min("user_id")).collect()[0][0])
    want = {
        r["event_date"]
        for r in e.filter(
            (F.col("user_id") == u) & (F.col("event_type") != "error")
        ).select("event_date").distinct().collect()
    }
    assert index_lookup_partitions(spark, idx, u) == want


def test_optimize_partitions_on_clone_materializes_locally(
    spark, sf_dir, tmp_path
):
    """Partial OPTIMIZE on a SHALLOW CLONE whose data still lives in the
    source via fallback_roots: the rewritten partitions must
    materialize under the CLONE (never write into the source), the
    untouched partitions keep resolving through the fallback chain, and
    the source's manifest and reads are byte-identical afterwards."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    e = _events(spark, sf_dir)
    # fragment every partition so OPTIMIZE has work on the clone
    init_table(
        spark, e.repartition(6).localCheckpoint(eager=True), src, "event_date"
    )
    src_m0 = read_manifest(src)
    clone_table(src, dst)

    from datalake2anomali_spark.io.publish import optimize_partitions

    v_opt, done = optimize_partitions(
        spark, dst, "event_date", "event_id", min_files=2, max_partitions=2
    )
    assert len(done) == 2
    m = read_manifest(dst)
    # rewritten partitions are owned by a clone-LOCAL version dir;
    # untouched ones still point through the fallback chain
    from datalake2anomali_spark.io.publish import _resolve_vdir, version_dir

    for pval, ver in m["partitions"].items():
        resolved = _resolve_vdir(dst, m, int(ver))
        if pval in done:
            assert resolved == version_dir(dst, int(ver)), (
                f"optimized partition {pval} resolved outside the clone"
            )
        assert os.path.isdir(resolved)
    # source untouched: same manifest, same content
    assert read_manifest(src) == src_m0
    key = F.sum(F.hash("event_id", "event_type")).alias("h")
    assert (
        read_snapshot(spark, dst, "event_date").agg(key).collect()
        == read_snapshot(spark, src, "event_date").agg(key).collect()
    )
    # full compaction afterwards drops the chain entirely
    compact_versioned(spark, dst, "event_date", "event_id")
    assert not read_manifest(dst).get("fallback_roots")
    assert (
        read_snapshot(spark, dst, "event_date").count() == e.count()
    )


def test_check_constraints_enforced_on_branch_and_survive_publish(
    spark, sf_dir, tmp_path
):
    """CHECK constraints × write-audit-publish: a branch head forked
    from a constrained table ENFORCES the table's constraints (the
    audit step can't stage garbage), a satisfying branch write lands
    invisibly to main, and after fast_forward publishes the branch the
    constraint set is still live on main."""
    from datalake2anomali_spark.io.publish import (
        ConstraintViolationError,
        create_branch,
        fast_forward,
        merge_into_versioned,
    )

    root = str(tmp_path / "t")
    e = _events(spark, sf_dir)
    cons = {"positive_value": "value >= 0"}
    init_table(spark, e, root, "event_date", constraints=cons)
    v0 = read_manifest(root)["version"]
    create_branch(root, "audit")
    branch_m0 = read_manifest(root, ref="audit")

    bad = e.limit(5).withColumn("value", F.lit(-1.0))
    try:
        merge_into_versioned(
            spark, root, bad, ["event_id"], "event_date", ref="audit"
        )
        raise AssertionError("violating branch write was accepted")
    except ConstraintViolationError:
        pass
    # main AND the branch are both still at the fork state
    assert read_manifest(root)["version"] == v0
    assert read_manifest(root, ref="audit") == branch_m0

    good = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("event_id", F.col("event_id") + 31_000_000)
        .withColumn("value", F.abs("value") + 1.0)
    )
    merge_into_versioned(
        spark, root, good, ["event_id"], "event_date", ref="audit"
    )
    # invisible to main until publish
    assert read_snapshot(spark, root, "event_date").count() == e.count()
    fast_forward(root, "audit")
    n_after = read_snapshot(spark, root, "event_date").count()
    assert n_after == e.count() + good.count()
    # the published manifest still carries the constraints: a violating
    # MAIN write is rejected post-publish
    try:
        merge_into_versioned(spark, root, bad, ["event_id"], "event_date")
        raise AssertionError("violating main write accepted after publish")
    except ConstraintViolationError:
        pass
    assert (
        read_snapshot(spark, root, "event_date").count() == n_after
    )


def test_multi_table_txn_catalog_time_travel(spark, sf_dir, tmp_path):
    """MultiTableTransaction × catalog time travel: after the one-swap
    commit moves both member pins, reading the catalog AT ITS PRE-TXN
    VERSION reproduces both tables' original consistent snapshot —
    the cross-table AS OF the single-table fixtures can't exercise."""
    from datalake2anomali_spark.io.catalog import (
        MultiTableTransaction,
        catalog_manifest,
        catalog_read,
        catalog_register,
        create_catalog,
    )

    croot = str(tmp_path / "cat")
    a_root = str(tmp_path / "events")
    b_root = str(tmp_path / "totals")
    e = _events(spark, sf_dir)
    totals = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("bucket", F.pmod("user_id", F.lit(4)).cast("string"))
    init_table(spark, e, a_root, "event_date")
    init_table(spark, totals, b_root, "bucket")
    create_catalog(croot)
    catalog_register(croot, "events", a_root)
    catalog_register(croot, "totals", b_root)
    cat_v0 = catalog_manifest(croot)["version"]

    mtxn = MultiTableTransaction(
        spark, croot, {"events": "event_date", "totals": "bucket"}
    )
    mtxn.table("events").update(
        F.col("event_type") == "click", {"value": F.col("value") + 7.0}
    )
    syn = totals.limit(3).withColumn("n", F.col("n") + 1000)
    mtxn.table("totals").merge(syn, ["user_id"])
    mtxn.commit()
    cat_v1 = catalog_manifest(croot)["version"]
    assert cat_v1 == cat_v0 + 1

    # current catalog view sees the transaction on BOTH tables
    cur_e = catalog_read(spark, croot, "events", "event_date")
    cur_t = catalog_read(spark, croot, "totals", "bucket")
    assert cur_t.filter(F.col("n") > 999).count() == 3
    s_cur = cur_e.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0][0]

    # time-traveled catalog reproduces the pre-txn snapshot exactly
    old_e = catalog_read(
        spark, croot, "events", "event_date", catalog_version=cat_v0
    )
    old_t = catalog_read(
        spark, croot, "totals", "bucket", catalog_version=cat_v0
    )
    s_old = old_e.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0][0]
    n_clicks = e.filter(F.col("event_type") == "click").count()
    assert s_cur - s_old == 700 * n_clicks
    assert old_t.filter(F.col("n") > 999).count() == 0
    assert old_t.count() == totals.count()
