"""Tests for operators/skew.py — salting must be a pure physical rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake2anomali_spark.operators import skew


def _skewed_df(spark):
    # key "hot" holds 90% of rows — the shape salting exists for
    rows = [(i, "hot" if i % 10 != 0 else f"cold{i % 50}", float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, k string, x double")


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.n, r.s, r.mx)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"), F.max("x").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mx)
        for r in skew.salted_agg(
            df,
            keys=["k"],
            partials={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (F.sum("x"), F.sum("s")),
                "mx": (F.max("x"), F.max("mx")),
            },
            salt_from=["row_id"],
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_phase1_fans_out_hot_key(spark):
    df = _skewed_df(spark)
    p1 = skew.with_salt(df, ["row_id"], 16).groupBy("k", "__salt").count()
    hot_shards = p1.filter(F.col("k") == "hot").count()
    assert hot_shards == 16  # the hot key spreads over every salt shard


def test_salted_join_matches_plain_join(spark):
    probe = _skewed_df(spark)
    build = spark.createDataFrame(
        [("hot", 1), ("cold0", 2), ("cold10", 3), ("absent", 4)], "k string, v int"
    )
    plain = sorted((r.row_id, r.v) for r in probe.join(build, "k").collect())
    salted = sorted(
        (r.row_id, r.v)
        for r in skew.salted_join(probe, build, keys=["k"], salt_from=["row_id"], n_salts=8).collect()
    )
    assert salted == plain and len(plain) == 940  # 900 hot + 2×20 cold matches


def test_partition_skew_stats_shows_salting_win(spark):
    """The straggler metric: salting must cut the max hash-partition size —
    the stage critical path on a real cluster — while total rows and the
    median stay put (same data, same uniform tail)."""
    df = _skewed_df(spark)  # 90% of rows on one key
    before = skew.partition_skew_stats(df, ["k"], num_partitions=16)
    after = skew.partition_skew_stats(
        skew.with_salt(df, ["row_id"], 16), ["k", "__salt"], num_partitions=16
    )
    assert before["total"] == after["total"] == 1000
    assert before["max"] >= 900  # the hot key's partition holds >=90%
    # 900 hot rows over 16 salts ≈ 56/shard; even with hash collisions the
    # max partition must drop several-fold
    assert after["max"] <= before["max"] / 3


def test_salted_join_left_keeps_unmatched(spark):
    probe = _skewed_df(spark).filter(F.col("k") != "hot")
    build = spark.createDataFrame([("cold0", 2)], "k string, v int")
    out = skew.salted_join(probe, build, keys=["k"], salt_from=["row_id"], n_salts=4, how="left")
    assert out.count() == probe.count()
    assert out.filter(F.col("v").isNull()).count() == probe.count() - 20
