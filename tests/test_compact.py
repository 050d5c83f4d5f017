"""File-count and layout tests for io/compact.py (the content-preservation
half is the compaction_roundtrip oracle query)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake2anomali_spark.io import compact
from datalake2anomali_spark.io.tables import load_table


def _fragmented_events(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    src = str(tmp_path / "frag")
    e.repartition(8).write.mode("overwrite").partitionBy("event_date").parquet(src)
    return e, src


def test_compaction_collapses_file_count(spark, sf_dir, tmp_path):
    e, src = _fragmented_events(spark, sf_dir, tmp_path)
    n_days = e.select("event_date").distinct().count()
    before = compact.total_files(src)
    assert before > 2 * n_days, "fixture not fragmented enough to test"
    dst = str(tmp_path / "compacted")
    after_df = compact.compact_dataset(
        spark, src, dst, ["event_date"], "event_id", target_file_bytes=64 << 20
    )
    after = compact.total_files(dst)
    # tiny total bytes → ONE output range → exactly one file per partition
    assert after == n_days < before
    assert after_df.count() == e.count()


def test_compaction_files_have_disjoint_order_ranges(spark, sf_dir, tmp_path):
    _, src = _fragmented_events(spark, sf_dir, tmp_path)
    dst = str(tmp_path / "clustered")
    # force multiple ranges so the clustering claim is actually exercised
    compact.compact_dataset(
        spark, src, dst, [], "event_id", target_file_bytes=16 << 10
    )
    assert compact.total_files(dst) > 1
    spans = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in spans])
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, f"overlapping file spans: {spans}"


def test_dataset_file_stats_groups_by_partition_dir(spark, sf_dir, tmp_path):
    _, src = _fragmented_events(spark, sf_dir, tmp_path)
    stats = compact.dataset_file_stats(src)
    assert all(k.startswith("event_date=") for k in stats)
    assert all(n >= 1 and b > 0 for n, b in stats.values())
    assert sum(n for n, _ in stats.values()) == compact.total_files(src)


def test_compact_missing_source_defaults_to_single_range(spark, tmp_path):
    # empty/missing listing must not crash the planner arithmetic
    src = str(tmp_path / "nope")
    os.makedirs(src)
    df = spark.range(10).withColumnRenamed("id", "event_id")
    df.write.mode("overwrite").parquet(src)  # now 1+ files, stats path exercised
    dst = str(tmp_path / "out")
    out = compact.compact_dataset(spark, src, dst, [], "event_id", 1 << 30)
    assert out.count() == 10 and compact.total_files(dst) == 1
