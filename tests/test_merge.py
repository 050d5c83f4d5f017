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

def test_merge_null_update_sticks(spark, target):
    """UPDATE SET value = NULL must write the NULL (real MERGE semantics),
    not silently keep the stale target value — the coalesce bug."""
    before = spark.read.parquet(target)
    victim = before.filter(F.col("value").isNotNull()).limit(3)
    ids = [r.event_id for r in victim.select("event_id").collect()]
    source = victim.withColumn("value", F.lit(None).cast("double"))

    merge_into(spark, target, source, ["event_id"], "event_date")

    after = spark.read.parquet(target)
    got = after.filter(F.col("event_id").isin(ids))
    assert got.count() == len(ids)
    assert got.filter(F.col("value").isNotNull()).count() == 0


def test_merge_partition_move_rewrites_old_home(spark, target):
    """A source row that changes the partition column MOVES the key: it
    lands in the new partition and is rewritten out of the old one —
    no duplicate, even when the old partition is emptied entirely."""
    before = spark.read.parquet(target)
    dates = sorted(r[0] for r in before.select("event_date").distinct().collect())
    d_old = str(dates[1])
    movers = before.filter(F.col("event_date") == d_old)
    n_movers = movers.count()
    ids = [r.event_id for r in movers.select("event_id").collect()]
    n_before = before.count()
    source = movers.withColumn("event_date", F.lit("2031-06-01"))

    merge_into(spark, target, source, ["event_id"], "event_date")

    after = spark.read.parquet(target)
    assert after.count() == n_before  # moved, not duplicated
    assert after.filter(F.col("event_date") == d_old).count() == 0
    assert after.filter(F.col("event_date") == "2031-06-01").count() == n_movers
    per_key = after.filter(F.col("event_id").isin(ids)).groupBy("event_id").count()
    assert per_key.filter(F.col("count") > 1).count() == 0
    # the emptied partition's directory is gone, not stale on disk
    assert not os.path.isdir(os.path.join(target, f"event_date={d_old}"))


def test_merge_partial_partition_move(spark, target):
    """Moving SOME keys out of a partition keeps the remainder intact."""
    before = spark.read.parquet(target)
    dates = sorted(r[0] for r in before.select("event_date").distinct().collect())
    d_old = str(dates[0])
    here = before.filter(F.col("event_date") == d_old)
    movers = here.filter(F.col("event_id") % 2 == 0)
    stay_n = here.filter(F.col("event_id") % 2 != 0).count()
    n_movers = movers.count()
    assert n_movers > 0 and stay_n > 0
    source = movers.withColumn("event_date", F.lit("2031-07-01"))

    merge_into(spark, target, source, ["event_id"], "event_date")

    after = spark.read.parquet(target)
    assert after.filter(F.col("event_date") == d_old).count() == stay_n
    assert after.filter(F.col("event_date") == "2031-07-01").count() == n_movers


def test_merge_escaped_and_null_partition_cleanup(spark, tmp_path):
    """Emptying a partition whose value needs hive percent-escaping (':',
    '/') or is NULL must remove the directory Spark actually wrote
    (escaped / __HIVE_DEFAULT_PARTITION__), not a raw-format sibling —
    otherwise the moved-out rows resurface and keys duplicate."""
    from datalake2anomali_spark.operators.merge import _hive_partition_dir

    path = str(tmp_path / "weird_parts")
    rows = [
        (1, "a:b/c", 1.0),
        (2, "a:b/c", 2.0),
        (3, None, 3.0),
        (4, "plain", 4.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, bucket string, value double")
    df.write.partitionBy("bucket").parquet(path)
    # sanity: our escape matches what Spark's writer produced
    assert os.path.isdir(os.path.join(path, _hive_partition_dir("bucket", "a:b/c")))
    assert os.path.isdir(os.path.join(path, _hive_partition_dir("bucket", None)))

    # move every row out of the escaped and NULL partitions
    source = spark.createDataFrame(
        [(1, "dest", 1.0), (2, "dest", 2.0), (3, "dest", 3.0)],
        "id bigint, bucket string, value double",
    )
    merge_into(spark, path, source, ["id"], "bucket")

    after = spark.read.parquet(path)
    assert after.count() == 4  # moved, not duplicated
    dup = after.groupBy("id").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    assert after.filter(F.col("bucket") == "a:b/c").count() == 0
    assert after.filter(F.col("bucket").isNull()).count() == 0
    assert not os.path.isdir(os.path.join(path, _hive_partition_dir("bucket", "a:b/c")))
    assert not os.path.isdir(os.path.join(path, _hive_partition_dir("bucket", None)))


def test_merge_partial_move_out_of_null_partition(spark, tmp_path):
    """Rows that STAY in the NULL partition while siblings move out must
    survive the rewrite (requires the null-safe affected-partition join)."""
    path = str(tmp_path / "null_part_stay")
    rows = [(1, None, 1.0), (2, None, 2.0), (3, "x", 3.0)]
    df = spark.createDataFrame(rows, "id bigint, bucket string, value double")
    df.write.partitionBy("bucket").parquet(path)

    source = spark.createDataFrame(
        [(1, "dest", 1.0)], "id bigint, bucket string, value double"
    )
    merge_into(spark, path, source, ["id"], "bucket")

    after = spark.read.parquet(path)
    assert after.count() == 3
    assert after.filter(F.col("bucket").isNull()).count() == 1  # id=2 stayed
    assert after.filter((F.col("id") == 1) & (F.col("bucket") == "dest")).count() == 1
