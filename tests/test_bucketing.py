"""Bucketed layout: exchange-free joins, bucket pruning, and runtime
bloom-filter join pruning — the three file/shuffle-skipping levers a
100-TB join plan lives on.  All assertions are on the executed/optimized
physical plan, not on timings."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.bucketing import bucketed_join, write_bucketed
from datalake2anomali_spark.io.tables import load_table


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", 8, path=str(base / "o"))
    write_bucketed(l, "b_lineitem", "o_orderkey", 8, path=str(base / "l"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    with _confs(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
        j = bucketed_join(spark, lt, rt, "o_orderkey")
        j.collect()
        plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    # values still correct vs the plain join
    with _confs(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
        want = (
            spark.table(lt).join(spark.table(rt).hint("merge"), "o_orderkey").count()
        )
    assert bucketed_join(spark, lt, rt, "o_orderkey").count() == want


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucket_pruning_on_key_equality(spark, bucketed_tables, sf_dir):
    lt, _ = bucketed_tables
    some_key = load_table(spark, sf_dir, "orders").select(F.min("o_orderkey")).collect()[0][0]
    # autoBucketedScan drops the bucketed layout when it sees no join/agg
    # to feed; disable it so the equality filter can prune buckets
    with _confs(spark, spark__sql__sources__bucketing__autoBucketedScan__enabled="false"):
        q = spark.table(lt).filter(F.col("o_orderkey") == int(some_key))
        q.collect()
        plan = _plan(q)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """With broadcast off, a selective filter on the build side injects a
    bloom filter into the probe-side scan (BloomFilterMightContain) —
    Spark's runtime row-level semi-join pruning, the shuffle-join analog
    of partition pruning at 100 TB."""
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__enabled="true",
        spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold="100MB",
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
        spark__sql__optimizer__runtimeFilter__semiJoinReduction__enabled="false",
    ):
        part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
        li = load_table(spark, sf_dir, "lineitem")
        j = li.join(part, li.l_partkey == part.p_partkey).select(
            "l_orderkey", "p_name"
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized or "BloomFilter" in optimized, optimized
        j.collect()
        executed = _plan(j)
    assert "might_contain" in executed or "BloomFilterMightContain" in executed, executed
