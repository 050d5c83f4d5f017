"""Sketch-aggregate tests (functions/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake2anomali_spark.functions.sketches import sketch_summary


def test_sketch_summary_bounds_hold(spark):
    # two groups: uniform values and a heavy-tailed group with ties
    rows = [("a", i % 37, float(i)) for i in range(1000)]
    rows += [("b", i % 11, float(i * i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, uid long, value double")
    out = {r.k: r for r in sketch_summary(df, "k", "uid", "value").collect()}
    assert out["a"].n_events == 1000 and out["a"].n_distinct_exact == 37
    assert out["b"].n_events == 500 and out["b"].n_distinct_exact == 11
    for k in ("a", "b"):
        assert out[k].hll_ok and out[k].p50_ok and out[k].p95_ok, out[k]


def test_sketch_summary_tiny_group(spark):
    # a 3-row group: rank slack (2 + 3%·n) must absorb discreteness
    df = spark.createDataFrame(
        [("t", 1, 1.0), ("t", 2, 100.0), ("t", 3, 10000.0)],
        "k string, uid long, value double",
    )
    r = sketch_summary(df, "k", "uid", "value").first()
    assert r.hll_ok and r.p50_ok and r.p95_ok
