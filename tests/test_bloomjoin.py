"""Bloom semi-join reduction (operators/bloomjoin.py): the reduced probe
is a SUPERSET of the true semi-join (no false negatives ever), the
filtered join is result-identical to the plain join, and the reduction
actually shrinks the shuffled row count on a selective build side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators.bloomjoin import (
    bloom_filtered_join,
    bloom_semi_reduce,
    build_key_bloom,
)


def test_no_false_negatives_and_real_reduction(spark, sf_dir):
    """Every true match survives reduction; a selective key set drops
    most probe rows before any join shuffle."""
    e = load_table(spark, sf_dir, "events")
    # build side: a selective synthetic key set (~1/13 of users)
    build = (
        e.filter(F.col("user_id") % 13 == 0)
        .select(F.col("user_id").alias("err_user"))
        .distinct()
    )
    words = build_key_bloom(build, "err_user")

    reduced = bloom_semi_reduce(e, words, "user_id")
    true_semi = e.join(
        build.withColumnRenamed("err_user", "user_id"), "user_id", "leftsemi"
    )
    n_all, n_red, n_true = e.count(), reduced.count(), true_semi.count()
    assert n_true <= n_red  # superset: bloom negatives are definitive
    # the reduction is real: strictly fewer rows than the raw probe
    # (sized so FPR stays tiny against the default 2^17-bit filter)
    assert n_red < n_all
    # and every true match key survives
    missing = true_semi.select("user_id").distinct().join(
        reduced.select("user_id").distinct(), "user_id", "left_anti"
    )
    assert missing.count() == 0


def test_filtered_join_is_result_identical(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    build = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("buyer"))
        .agg(F.count(F.lit(1)).alias("n_buys"))
    )
    got = bloom_filtered_join(e, build, "user_id", "buyer").select(
        "event_id", "buyer", "n_buys"
    )
    want = e.join(build, F.col("user_id") == F.col("buyer")).select(
        "event_id", "buyer", "n_buys"
    )
    assert got.count() == want.count()
    assert (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    )

    # the common shape: SAME key name on both sides must not be ambiguous
    build2 = build.withColumnRenamed("buyer", "user_id")
    got2 = bloom_filtered_join(e, build2, "user_id", "user_id").select(
        "event_id", "n_buys"
    )
    assert got2.count() == want.count()


def test_null_keys_never_pass(spark):
    probe = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, key long"
    )
    build = spark.createDataFrame([(10,), (99,)], "key long")
    words = build_key_bloom(build, "key")
    kept = bloom_semi_reduce(probe, words, "key")
    ids = sorted(r.id for r in kept.collect())
    assert 2 not in ids  # NULL can never equi-join
    assert 1 in ids


def test_geometry_validation():
    with pytest.raises(ValueError, match="multiple of 64"):
        build_key_bloom(None, "k", m_bits=100)


def test_probe_stays_jvm_side(spark, sf_dir):
    """The reduced probe's plan must contain no Python evaluation node —
    the hot path is xxhash64 + array bit tests inside codegen."""
    import contextlib
    import io

    e = load_table(spark, sf_dir, "events")
    build = e.limit(50).select(F.col("user_id").alias("k")).distinct()
    words = build_key_bloom(build, "k")
    reduced = bloom_semi_reduce(e, words, "user_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        reduced.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_geometry_ceiling_enforced(spark):
    """VERDICT r7 #7: the bitmap is one array<long> row, so m_bits past
    MAX_M_BITS (8 MiB) is refused loudly instead of shipping a multi-MB
    single-row broadcast; mismatched build/probe geometry is refused too."""
    import pytest

    from datalake2anomali_spark.operators.bloomjoin import (
        MAX_M_BITS,
        bloom_semi_reduce,
        build_key_bloom,
    )

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="MAX_M_BITS"):
        build_key_bloom(df, "k", m_bits=MAX_M_BITS * 2)
    with pytest.raises(ValueError, match="multiple of 64"):
        build_key_bloom(df, "k", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        build_key_bloom(df, "k", k=0)
    words = build_key_bloom(df, "k", m_bits=128)
    with pytest.raises(ValueError, match="share one geometry"):
        bloom_semi_reduce(df, words, "k", m_bits=256)
    # the ceiling itself is accepted (boundary, not off-by-one)
    assert len(build_key_bloom(spark.range(1).withColumnRenamed("id", "k"),
                               "k", m_bits=MAX_M_BITS)) == MAX_M_BITS // 64
