"""Round-5 scale operators: heavy hitters, Z-order layout, schema evolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.functions.heavy import heavy_hitters, local_heavy_candidates
from datalake2anomali_spark.io.evolution import align_to_schema, union_generations
from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators.layout import write_zordered, zorder_key2

# ---------------------------------------------------------------- heavy hitters


def test_heavy_hitters_matches_exact_groupby(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    m = 200
    got = {(r[0], r[1]) for r in heavy_hitters(e, "user_id", m).collect()}
    n = e.count()
    want = {
        (r[0], r[1])
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * m > n)
        .collect()
    }
    assert got == want
    assert got, "fixture should produce at least one heavy hitter at m=200"


def test_heavy_hitters_candidates_are_superset_and_bounded(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").repartition(8)
    m = 150
    cands = {r[0] for r in local_heavy_candidates(e, "user_id", m).collect()}
    n = e.count()
    true_heavy = {
        r[0]
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * m > n)
        .collect()
    }
    assert true_heavy <= cands
    # candidate bound: fewer than m values can exceed a 1/m share per
    # partition, so |candidates| < m * n_partitions
    assert len(cands) < m * 8


def test_heavy_hitters_skewed_key_found(spark):
    # one key holds ~30% of rows; everything else is unique
    rows = [(0,)] * 300 + [(i,) for i in range(1, 701)]
    df = spark.createDataFrame(rows, "k bigint").repartition(16)
    got = heavy_hitters(df, "k", m=5).collect()
    assert [(r["k"], r["cnt"]) for r in got] == [(0, 300)]


def test_heavy_hitters_rejects_degenerate_m(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        heavy_hitters(e, "user_id", m=1)


# --------------------------------------------------------------------- z-order


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "a bigint, b bigint"
    )
    got = [r[0] for r in df.select(zorder_key2("a", "b")).collect()]

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    want = [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]]
    assert got == want


def _per_file_ranges(spark, path: str, cols: list[str]):
    """min/max of each col per physical parquet file (footer-stat proxy)."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_lo"), F.max(c).alias(f"{c}_hi")]
    return df.groupBy("_f").agg(*aggs).collect()


def test_write_zordered_bounds_both_dims(spark, sf_dir, tmp_path):
    """Z-layout files cover bounded sub-ranges of BOTH dims; a ts-sorted
    layout leaves user_id unbounded per file (zero skipping on user
    predicates)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 60000000").alias("minute_idx"),
    )
    lo_hi = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("minute_idx"), F.max("minute_idx")
    ).collect()[0]
    u_lo, u_hi, t_lo, t_hi = lo_hi
    u8 = ((F.col("user_id") - u_lo) * 255 / F.lit(max(u_hi - u_lo, 1))).cast("long")
    t8 = ((F.col("minute_idx") - t_lo) * 255 / F.lit(max(t_hi - t_lo, 1))).cast("long")
    scaled = e.withColumn("u8", u8).withColumn("t8", t8)

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "tsorted")
    write_zordered(scaled, "u8", "t8", zpath, n_files=8)
    scaled.repartitionByRange(8, "t8").write.mode("overwrite").parquet(spath)

    def frac_bounded(path, col, full_span):
        ranges = _per_file_ranges(spark, path, [col])
        spans = [r[f"{col}_hi"] - r[f"{col}_lo"] for r in ranges]
        return sum(1 for s in spans if s <= 0.6 * full_span) / len(spans)

    # the z layout bounds user ranges in at least half the files; the
    # single-dim time sort bounds none of them
    assert frac_bounded(zpath, "u8", 255) >= 0.5
    assert frac_bounded(spath, "u8", 255) == 0.0
    # and the z layout still keeps time ranges bounded in at least half
    assert frac_bounded(zpath, "t8", 255) >= 0.5


# ------------------------------------------------------------- schema evolution


def test_align_to_schema_fills_and_casts(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    target = spark.createDataFrame(
        [(1, "a", 2.0)], "id bigint, name string, score double"
    ).schema
    out = align_to_schema(df, target)
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint",
        "name:string",
        "score:double",
    ]
    assert out.collect() == [(1, "a", None)]


def test_union_generations_matches_union_by_name(spark):
    g1 = spark.createDataFrame([(1, "x")], "id bigint, name string")
    g2 = spark.createDataFrame(
        [(2, "y", 0.5)], "id bigint, name string, score double"
    )
    got = union_generations([g1, g2]).orderBy("id").collect()
    want = (
        g1.unionByName(g2, allowMissingColumns=True).orderBy("id").collect()
    )
    assert got == want


def test_read_evolving_merges_generations(spark, tmp_path):
    p1, p2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    spark.createDataFrame([(1, "x")], "id bigint, name string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "y", 0.5)], "id bigint, name string, score double"
    ).write.parquet(p2)
    from datalake2anomali_spark.io.evolution import read_evolving

    out = read_evolving(spark, p1, p2).orderBy("id")
    assert set(out.columns) == {"id", "name", "score"}
    rows = out.collect()
    assert rows[0]["score"] is None and rows[1]["score"] == 0.5
