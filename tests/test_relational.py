from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from datalake2anomali_spark.plans import relational


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_q1_groups_and_determinism(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    rows1 = df.collect()
    assert len(rows1) == 6  # 3 returnflags x 2 linestatus
    # deterministic under different partitioning
    rows2 = (
        relational.q1_pricing_summary(spark, sf_dir).repartition(13).collect()
    )
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_q3_topk_deterministic_ties(spark, sf_dir):
    df = relational.q3_shipping_priority(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_broadcast_plan(spark, sf_dir):
    df = relational.q5_local_supplier(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
