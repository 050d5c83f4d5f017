"""Copy-on-write MERGE INTO: update/insert/copy semantics + untouched
partitions stay untouched bytes (the 100-TB property)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators.merge import merge_into


def _files(root: str) -> dict[str, set[tuple[str, float]]]:
    """parquet files (name, mtime) per partition dir."""
    out: dict[str, set] = {}
    for dirpath, _dirs, files in os.walk(root):
        part = os.path.relpath(dirpath, root)
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out.setdefault(part, set()).add((f, os.path.getmtime(p)))
    return out


@pytest.fixture()
def target(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_t")
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("event_date").parquet(path)
    return path


def test_merge_updates_inserts_and_preserves_unaffected(spark, target):
    before = spark.read.parquet(target)
    dates = sorted(r[0] for r in before.select("event_date").distinct().collect())
    d_upd = str(dates[0])
    files_before = _files(target)

    upd = (
        before.filter(F.col("event_date") == d_upd)
        .filter(F.col("event_type") == "click")
        .withColumn("value", F.col("value") + 1000.0)
    )
    ins = (
        before.filter(F.col("event_date") == d_upd)
        .limit(5)
        .withColumn("event_id", F.col("event_id") + 10_000_000)
        .withColumn("event_date", F.lit("2030-01-01"))
    )
    source = upd.unionByName(ins)
    n_before = before.count()
    n_upd, n_ins = upd.count(), ins.count()
    n_keep = before.filter(
        (F.col("event_date") == d_upd) & (F.col("event_type") != "click")
    ).count()

    merge_into(spark, target, source, ["event_id"], "event_date")

    after = spark.read.parquet(target)
    assert after.count() == n_before + n_ins
    # updates applied
    assert (
        after.filter(
            (F.col("event_date") == d_upd)
            & (F.col("event_type") == "click")
            & (F.col("value") < 1000.0)
        ).count()
        == 0
    )
    # non-matched rows in the affected partition copied through unchanged
    assert (
        after.filter(
            (F.col("event_date") == d_upd) & (F.col("event_type") != "click")
        ).count()
        == n_keep
    )
    # new partition exists with the inserts
    assert after.filter(F.col("event_date") == "2030-01-01").count() == n_ins

    # every partition OTHER than the affected + new one is bit-untouched
    files_after = _files(target)
    touched = {f"event_date={d_upd}", "event_date=2030-01-01"}
    for part, fs in files_before.items():
        if part.split(os.sep)[0] not in touched and part != ".":
            assert files_after.get(part) == fs, f"partition {part} was rewritten"
    assert files_after[f"event_date={d_upd}"] != files_before[f"event_date={d_upd}"]


def test_merge_rejects_missing_columns(spark, target):
    bad = spark.range(3).select(F.col("id").alias("event_id"))
    with pytest.raises(ValueError, match="missing target columns"):
        merge_into(spark, target, bad, ["event_id"], "event_date")
