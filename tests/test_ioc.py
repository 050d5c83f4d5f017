"""Unit tests for the IOC pipeline quirks the reference encodes.

Each test pins one behavior from /root/reference/src/Datalake2Anomali.py
(cited in the operator docstrings): unknown-type discard, md5-null discard,
arity guard, itype coalesce order, union-all no-dedup, F1 spec rejection,
payload assembly, upsert routing.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.ioc.payload import objects_json, prepare_objects
from datalake2anomali_spark.ioc.schemas import BULK_RAW_SCHEMA
from datalake2anomali_spark.ioc.specs import QuerySpec, specs_df, validate_specs
from datalake2anomali_spark.ioc.transforms import generate_indicators, parse_positional
from datalake2anomali_spark.ioc.upsert import (
    high_watermark,
    incremental_advisories,
    route_upserts,
)


@pytest.fixture(scope="module")
def bulk_raw(spark):
    rows = [
        ("qh-a", '["domain","evil.com",null,[10,90,40],["t1","t2"]]'),
        ("qh-a", '["fqdn","sub.evil.com",null,[5],["t1"]]'),
        ("qh-a", '["file","dropper.exe","d41d8cd98f00b204e9800998ecf8427e",[77]]'),
        ("qh-a", '["file","no-hash.exe",null,[50],["x"]]'),  # F3: dropped
        ("qh-a", '["cve","CVE-2024-1",null,[99],["x"]]'),  # F2: dropped
        ("qh-b", '["domain","evil.com",null,[10,90,40],["t1","t2"]]'),  # O2 dup
        ("qh-b", '["ip","10.0.0.1",null,[60]]'),  # arity-4: no tags
        ("qh-invalid", '["url","http://x",null,[1]]'),  # F1: spec invalid
    ]
    return spark.createDataFrame(rows, BULK_RAW_SCHEMA)


@pytest.fixture(scope="module")
def specs(spark):
    return specs_df(
        spark,
        [
            QuerySpec("qh-a", "ds_a", "high", {"domain": "override_dom"}),
            QuerySpec("qh-b", "ds_b", "low", None),
            QuerySpec(None, "ds_bad", "low", None),  # F1 reject
            QuerySpec("qh-invalid", "", "medium", None),  # F1 reject (empty)
        ],
    )


@pytest.fixture(scope="module")
def indicators(bulk_raw, specs):
    valid, rejected = validate_specs(specs)
    assert rejected.count() == 2
    return generate_indicators(bulk_raw, valid).cache()


def test_parse_arity_guard(spark, bulk_raw):
    parsed = parse_positional(bulk_raw)
    row = parsed.filter(F.col("atom_value") == "10.0.0.1").first()
    assert row.threat_tags is None  # absent 5th element, reference :374
    assert row.threat_scores == [60]


def test_unknown_type_discarded(indicators):
    # F2 (:378-381): 'cve' has no DTL_TO_ANOMALI_TYPE entry
    assert indicators.filter(F.col("atom_type") == "cve").count() == 0


def test_md5_null_discarded(indicators):
    # F3 (:347-351): file atom without md5 dropped; with md5 kept as 'md5'
    assert indicators.filter(F.col("atom_value") == "no-hash.exe").count() == 0
    kept = indicators.filter(F.col("atom_value") == "dropper.exe").collect()
    assert len(kept) == 1 and kept[0].anomali_type == "md5"


def test_invalid_spec_rows_dropped(indicators):
    # F1 (:283-294): rows from a spec failing validation never surface
    assert indicators.filter(F.col("atom_value") == "http://x").count() == 0


def test_union_all_no_dedup(indicators):
    # O2 (:342-377): same atom under two specs → two indicators
    dups = indicators.filter(F.col("atom_value") == "evil.com").collect()
    assert len(dups) == 2
    assert {d.dataset_name for d in dups} == {"ds_a", "ds_b"}


def test_itype_coalesce_order(indicators):
    # J3 (:353-358): spec override wins, else default map
    a = {r.atom_value: r.anomali_itype for r in indicators.collect()}
    assert a["sub.evil.com"] == "override_dom"  # fqdn→domain, override present
    assert a["10.0.0.1"] == "actor_ip"  # no override map → default
    assert a["dropper.exe"] == "mal_md5"


def test_payload_confidence_and_tags(indicators):
    objs = prepare_objects(indicators, tags_tlp="amber", add_dtl_tags=True)
    r = objs.filter((F.col("value") == "evil.com") & (F.col("itype") == "override_dom")).first()
    assert r.confidence == 90  # A1: max([10,90,40]) (:83)
    assert [t.asDict() for t in r.tags] == [
        {"name": "ds_a", "tlp": "amber"},
        {"name": "t1", "tlp": "amber"},
        {"name": "t2", "tlp": "amber"},
    ]


def test_payload_object_json_type_key(indicators):
    objs = objects_json(prepare_objects(indicators))
    # for md5-typed rows the sink value is the HASH, not the filename (:72-77)
    r = objs.filter(F.col("value_key") == "md5").first()
    doc = json.loads(r.object_json)
    # P4 (:72-79): value lands under a key NAMED AFTER its type
    assert doc["md5"] == "d41d8cd98f00b204e9800998ecf8427e"
    assert doc["severity"] == "high"
    assert isinstance(doc["confidence"], int)
    assert doc["tags"][0] == {"name": "ds_a", "tlp": "white"}


def test_upsert_routing(spark):
    adv = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], "id long, title string"
    )
    existing = spark.createDataFrame(
        [
            (100, ["unrelated", "world_watch_1"], "2024-01-01 00:00:00"),
            (101, ["world_watch_999"], "2024-01-02 00:00:00"),
            (102, ["not_a_match_2"], "2024-01-03 00:00:00"),
        ],
        "id long, tags array<string>, modified_ts string",
    ).withColumn("modified_ts", F.col("modified_ts").cast("timestamp"))
    routed = {r.id: (r.action, r.tipreport_id) for r in route_upserts(adv, existing).collect()}
    assert routed[1] == ("update", 100)  # J4 found → PATCH (:189-217)
    assert routed[2] == ("insert", None)  # prefix-only tag must not match
    assert routed[3] == ("insert", None)  # J4 miss → POST (:219-244)


def test_watermark_empty_state_keeps_all(spark):
    adv = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-02-01 00:00:00")],
        "id long, timestamp_updated string",
    ).withColumn("timestamp_updated", F.col("timestamp_updated").cast("timestamp"))
    empty = spark.createDataFrame(
        [], "id long, tags array<string>, modified_ts timestamp"
    )
    assert high_watermark(empty).first().watermark is None
    kept = incremental_advisories(adv, empty)
    assert kept.count() == 2  # null watermark → no cursor yet → keep all
