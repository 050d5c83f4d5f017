"""Multi-statement transactions (io/transaction.py): staged UPDATE /
DELETE / MERGE publish as ONE atomic version, parity with the same
statements run as individual commits, commit-time constraints, conflict
detection against a concurrent writer, and single-shot lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    ConcurrentWriteError,
    ConstraintViolationError,
    delete_from_versioned,
    init_table,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
    update_versioned,
)
from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.io.transaction import Transaction


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


def test_transaction_matches_sequential_statements(spark, sf_dir, tmp_path):
    """One txn commit == the same statements as three separate commits
    (content parity), but with exactly ONE version published and nothing
    visible before commit."""
    e = _events(spark, sf_dir)
    txn_root = str(tmp_path / "txn")
    seq_root = str(tmp_path / "seq")
    init_table(spark, e, txn_root, "event_date")
    init_table(spark, e, seq_root, "event_date")
    v0 = read_manifest(txn_root)["version"]

    upd_cond = F.col("event_type") == "click"
    upd_set = {"value": F.col("value") * 2}
    del_cond = (F.col("event_type") == "view") & (F.col("event_id") % 4 == 0)
    src = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("value", F.col("value") + 1000)
        .unionByName(
            e.filter(F.col("event_type") == "error")
            .withColumn("event_id", F.col("event_id") + 70_000_000)
            .withColumn("event_type", F.lit("promo"))
        )
    )

    txn = Transaction(spark, txn_root, "event_date")
    txn.update(upd_cond, upd_set).delete(del_cond).merge(src, ["event_id"])
    # staging is invisible: no version moved, content untouched
    assert read_manifest(txn_root)["version"] == v0
    v = txn.commit()
    assert v == v0 + 1  # the whole batch is ONE commit
    assert read_manifest(txn_root)["operation"] == "txn(update,delete,merge)"

    update_versioned(spark, seq_root, "event_date", upd_cond, upd_set)
    delete_from_versioned(spark, seq_root, "event_date", del_cond)
    merge_into_versioned(spark, seq_root, src, ["event_id"], "event_date")
    assert read_manifest(seq_root)["version"] == v0 + 3
    assert _fp(spark, txn_root) == _fp(spark, seq_root)


def test_transaction_statement_order_and_noop(spark, sf_dir, tmp_path):
    """Later statements see earlier ones (a DELETE keyed on the UPDATE's
    new values), and a txn whose statements match nothing publishes no
    version."""
    e = _events(spark, sf_dir)
    root = str(tmp_path / "ord")
    init_table(spark, e, root, "event_date")
    v0 = read_manifest(root)["version"]

    txn = Transaction(spark, root, "event_date")
    txn.update(
        F.col("event_type") == "click", {"event_type": F.lit("click2")}
    )
    txn.delete(F.col("event_type") == "click2")  # sees the renamed rows
    txn.commit()
    snap = read_snapshot(spark, root, "event_date")
    assert snap.filter(F.col("event_type").isin("click", "click2")).count() == 0
    assert snap.count() == e.filter(F.col("event_type") != "click").count()

    noop = Transaction(spark, root, "event_date")
    noop.delete(F.col("event_type") == "no_such_type")
    assert noop.commit() == read_manifest(root)["version"] == v0 + 1

    empty = Transaction(spark, root, "event_date")
    assert empty.commit() == v0 + 1  # zero statements: no empty commit


def test_transaction_constraints_conflict_lifecycle(spark, sf_dir, tmp_path):
    """Commit-time constraint failure leaves the base snapshot; an
    intermediate violation repaired by a later statement commits fine
    (deferred semantics); a concurrent writer conflicts the txn; closed
    transactions refuse reuse."""
    e = _events(spark, sf_dir)
    root = str(tmp_path / "cc")
    init_table(
        spark, e, root, "event_date",
        constraints={"value_nonneg": "value >= 0 OR value IS NULL"},
    )
    v0 = read_manifest(root)["version"]
    fp0 = _fp(spark, root)

    bad = Transaction(spark, root, "event_date")
    bad.update(F.col("event_type") == "click", {"value": F.lit(-1.0)})
    with pytest.raises(ConstraintViolationError, match="value_nonneg"):
        bad.commit()
    assert read_manifest(root)["version"] == v0
    assert _fp(spark, root) == fp0
    with pytest.raises(RuntimeError, match="already committed"):
        bad.commit()

    # deferred: statement 1 violates, statement 2 repairs -> commits
    deferred = Transaction(spark, root, "event_date")
    deferred.update(F.col("event_type") == "click", {"value": F.lit(-1.0)})
    deferred.update(F.col("event_type") == "click", {"value": F.lit(2.5)})
    deferred.commit()
    clicks = read_snapshot(spark, root, "event_date").filter(
        F.col("event_type") == "click"
    )
    assert clicks.filter(F.col("value") != 2.5).count() == 0

    # conflict: another writer commits between txn start and txn commit
    txn = Transaction(spark, root, "event_date")
    txn.delete(F.col("event_type") == "error")
    update_versioned(
        spark, root, "event_date",
        F.col("event_type") == "signup", {"value": F.col("value") + 1},
    )
    with pytest.raises(ConcurrentWriteError):
        txn.commit()

    rb = Transaction(spark, root, "event_date")
    rb.delete(F.lit(True))
    rb.rollback()
    with pytest.raises(RuntimeError, match="already committed"):
        rb.delete(F.lit(True))
    assert read_snapshot(spark, root, "event_date").count() > 0


def test_transaction_staging_validation(spark, sf_dir, tmp_path):
    """Staging-time refusals: unknown SET columns, merge source with
    missing or extra columns."""
    e = _events(spark, sf_dir)
    root = str(tmp_path / "val")
    init_table(spark, e, root, "event_date")
    txn = Transaction(spark, root, "event_date")
    with pytest.raises(ValueError, match="unknown columns"):
        txn.update(F.lit(True), {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="missing target columns"):
        txn.merge(e.select("event_id", "value"), ["event_id"])
    with pytest.raises(ValueError, match="adds columns"):
        txn.merge(e.withColumn("extra", F.lit(1)), ["event_id"])
    # the failed stagings left nothing staged; commit is a no-op
    assert txn.commit() == read_manifest(root)["version"]
