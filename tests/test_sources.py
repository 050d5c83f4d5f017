from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.ioc.specs import QuerySpec, specs_df
from datalake2anomali_spark.ioc.transforms import generate_indicators
from datalake2anomali_spark.sources import enrich_html, register_sources
from datalake2anomali_spark.sources.mock_backend import (
    DEFAULT_FIELDS,
    advisories,
    bulk_search,
    result_count,
)

HASHES = ["aaa111", "bbb222", "ccc333"]
FIELDS_WITH_TAGS = DEFAULT_FIELDS + ["tags"]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sources(spark)


def _bulk_reader(spark, hashes=HASHES, fields=FIELDS_WITH_TAGS):
    return (
        spark.read.format("datalake_bulksearch")
        .option("query_hashes", json.dumps(hashes))
        .option("query_fields", json.dumps(fields))
        .load()
    )


def test_bulksearch_partition_per_query(spark):
    df = _bulk_reader(spark)
    assert df.rdd.getNumPartitions() == len(HASHES)
    counts = {r.query_hash: r.n for r in df.groupBy("query_hash").agg(F.count("*").alias("n")).collect()}
    assert counts == {h: result_count(h) for h in HASHES}


def test_bulksearch_rows_match_backend(spark):
    df = _bulk_reader(spark, hashes=["aaa111"])
    got = [json.loads(r.raw) for r in df.collect()]
    want = bulk_search("aaa111", FIELDS_WITH_TAGS)["results"]
    assert got == want


def test_bulksearch_projection_changes_row_shape(spark):
    # without the conditional "tags" field the positional rows have arity 4
    df = _bulk_reader(spark, hashes=["aaa111"], fields=DEFAULT_FIELDS)
    arities = {len(json.loads(r.raw)) for r in df.collect()}
    assert arities == {4}


def test_bulksearch_filter_pushdown(spark):
    df = _bulk_reader(spark, hashes=["aaa111"]).filter(
        F.get_json_object("raw", "$[0]") == "ip"
    )
    # that filter shape is NOT pushable (json path), stays in Spark — baseline
    baseline = df.count()
    # structured source column filters ARE pushed; emulate via atom_type option
    pushed = (
        spark.read.format("datalake_bulksearch")
        .option("query_hashes", json.dumps(["aaa111"]))
        .option("query_fields", json.dumps(FIELDS_WITH_TAGS))
        .load()
    )
    rows = [json.loads(r.raw) for r in pushed.collect()]
    assert baseline == sum(1 for r in rows if r[0] == "ip")


def test_ep_a_pipeline_over_rest_source(spark):
    """EP-A end-to-end with the REST source standing in for parquet."""
    bulk = _bulk_reader(spark)
    specs = specs_df(
        spark,
        [
            QuerySpec(query_hash=h, dataset_name=f"ds_{h}", anomali_severity="high")
            for h in HASHES
        ],
    )
    ind = generate_indicators(bulk, specs)
    rows = ind.collect()
    assert rows
    # F2: unknown atom types (cve, paste) never survive
    assert {r.atom_type for r in rows} <= {"fqdn", "domain", "ip", "url", "email", "file"}
    # F3: every surviving file atom has an md5
    assert all(r.hashes_md5 for r in rows if r.anomali_type == "md5")
    # J2: dataset name inherited from the producing spec
    assert {r.dataset_name for r in rows} == {f"ds_{h}" for h in HASHES}


def test_worldwatch_incremental_cursor_option(spark):
    full = spark.read.format("worldwatch_advisories").load()
    cursor = "2024-01-05T00:00:00Z"
    inc = (
        spark.read.format("worldwatch_advisories")
        .option("updated_after", cursor)
        .load()
    )
    assert full.count() == len(advisories())
    assert inc.count() == len(advisories(cursor))
    assert inc.count() < full.count()
    assert all(r.timestamp_updated > cursor for r in inc.collect())


def test_worldwatch_filter_pushdown_equals_option(spark):
    cursor = "2024-01-05T00:00:00Z"
    via_filter = (
        spark.read.format("worldwatch_advisories")
        .load()
        .filter(F.col("timestamp_updated") > cursor)
    )
    assert via_filter.count() == len(advisories(cursor))


def test_enrich_html(spark):
    adv = spark.read.format("worldwatch_advisories").load().limit(5)
    out = enrich_html(adv).collect()
    assert len(out) == 5
    for r in out:
        assert f"advisory {r.id} body" in r.html
