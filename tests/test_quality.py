"""Edge-semantics tests for operators/quality.py (audit, snapshot_diff)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.operators import quality


def test_audit_counts_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 5.0, "R"),
            (1, 1, 60.0, "A"),  # duplicate key + range-high violation
            (2, 1, None, "Z"),  # null range value + bad accepted value
            (3, 2, 0.5, None),  # range-low violation + null returnflag
        ],
        "k long, ln int, qty double, flag string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    out = {
        r.check_name: r
        for r in quality.audit(
            df,
            checks=[
                quality.non_null("flag"),
                quality.unique("k", "ln"),
                quality.in_range("qty", 1, 50),
                quality.accepted("flag", "R", "A"),
            ],
            foreign_keys=[("k", dim, "dk")],
        ).collect()
    }
    assert (out["non_null:flag"].observed, out["non_null:flag"].passed) == (3, False)
    assert (out["unique:k,ln"].observed, out["unique:k,ln"].passed) == (3, False)
    r = out["in_range:qty:[1,50]"]
    assert (r.observed, r.expected, r.passed) == (3, 0, False)  # 60, NULL, 0.5
    assert out["accepted:flag"].observed == 2  # 'Z' and NULL both rejected
    assert (out["foreign_key:k"].observed, out["foreign_key:k"].passed) == (1, False)


def test_audit_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, 1, 5.0, "R"), (1, 2, 7.0, "A")],
                               "k long, ln int, qty double, flag string")
    dim = spark.createDataFrame([(1,)], "dk long")
    rows = quality.audit(
        df,
        checks=[quality.non_null("flag"), quality.unique("k", "ln"),
                quality.in_range("qty", 1, 50), quality.accepted("flag", "R", "A")],
        foreign_keys=[("k", dim, "dk")],
    ).collect()
    assert all(r.passed for r in rows) and len(rows) == 5


def test_audit_single_scan_plan(spark, sf_dir):
    """The non-FK constraint suite must compile to ONE scan of the fact
    table — one pass per constraint would re-read 100 TB N times."""
    from datalake2anomali_spark.io.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        quality.audit(li, checks=[quality.non_null("l_returnflag"),
                                  quality.in_range("l_quantity", 1, 50)])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") <= 1 or plan.count("Scan parquet") <= 1, plan


def test_snapshot_diff_classifies_and_names_columns(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "cX", 31.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r.k: r for r in quality.snapshot_diff(old, new, keys=["k"]).collect()}
    assert set(out) == {1, 3, 5}  # 2 and 4 unchanged (incl. NULL==NULL)
    assert out[1].change_type == "removed" and out[1].changed_cols == ""
    assert out[5].change_type == "added"
    assert out[3].change_type == "changed"
    assert out[3].changed_cols == "s,v"  # deterministic schema order


def test_snapshot_diff_null_transitions_are_changes(spark):
    old = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, "b")], "k long, s string")
    out = {r.k: r for r in quality.snapshot_diff(old, new, keys=["k"]).collect()}
    assert out[1].change_type == "changed" and out[1].changed_cols == "s"
    assert out[2].change_type == "changed" and out[2].changed_cols == "s"


def test_snapshot_diff_rejects_schema_drift(spark):
    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, v double")
    with pytest.raises(ValueError, match="schemas differ"):
        quality.snapshot_diff(old, new, keys=["k"])


def test_snapshot_diff_all_null_payload_presence(spark):
    # a row whose every non-key column is NULL must still read as PRESENT
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([], "k long, s string")
    out = quality.snapshot_diff(old, new, keys=["k"]).collect()
    assert len(out) == 1 and out[0].change_type == "removed"


def test_unique_check_null_key_semantics(spark):
    """NULL-bearing key tuples count like the oracle's row-structs: all
    tuples distinct (incl. NULL-containing ones) → unique PASSES; a
    duplicated NULL-keyed tuple → FAILS."""
    from datalake2anomali_spark.operators import quality

    distinct_rows = spark.createDataFrame(
        [(1, "a"), (None, "a"), (None, "b"), (2, None)], "k int, s string"
    )
    row = (
        quality.audit(distinct_rows, [quality.unique("k", "s")])
        .collect()[0]
    )
    assert row.observed == 4 and row.passed

    dup_null = spark.createDataFrame(
        [(None, "a"), (None, "a"), (1, "b")], "k int, s string"
    )
    row = quality.audit(dup_null, [quality.unique("k", "s")]).collect()[0]
    assert row.observed == 2 and not row.passed
