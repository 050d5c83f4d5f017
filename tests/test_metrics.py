"""A3/K5: observe()-based pipeline metrics (ioc/metrics.py).

Pins the reference's per-query count + discard logging
(/root/reference/src/Datalake2Anomali.py:327-332, 378-381) re-expressed as
``df.observe()`` counters, and the equivalence of the instrumented plan with
the stock EP-A chain.
"""

from __future__ import annotations

import pytest

from datalake2anomali_spark.ioc.metrics import instrumented_indicators, log_metrics
from datalake2anomali_spark.ioc.schemas import BULK_RAW_SCHEMA
from datalake2anomali_spark.ioc.specs import QuerySpec, specs_df, validate_specs
from datalake2anomali_spark.ioc.transforms import generate_indicators


@pytest.fixture(scope="module")
def bulk_raw(spark):
    rows = [
        ("qh-a", '["domain","evil.com",null,[10,90,40],["t1","t2"]]'),
        ("qh-a", '["fqdn","sub.evil.com",null,[5],["t1"]]'),
        ("qh-a", '["file","dropper.exe","d41d8cd98f00b204e9800998ecf8427e",[77]]'),
        ("qh-a", '["file","no-hash.exe",null,[50],["x"]]'),  # F3 discard
        ("qh-a", '["cve","CVE-2024-1",null,[99],["x"]]'),  # F2 discard
        ("qh-b", '["domain","evil.com",null,[10,90,40],["t1","t2"]]'),
        ("qh-b", '["ip","10.0.0.1",null,[60]]'),
        ("qh-invalid", '["url","http://x",null,[1]]'),  # spec dropped by F1
    ]
    return spark.createDataFrame(rows, BULK_RAW_SCHEMA)


@pytest.fixture(scope="module")
def valid_specs(spark):
    valid, _ = validate_specs(
        specs_df(
            spark,
            [
                QuerySpec("qh-a", "ds_a", "high", {"domain": "override_dom"}),
                QuerySpec("qh-b", "ds_b", "low", None),
                QuerySpec("qh-invalid", "", "medium", None),  # F1 reject
            ],
        )
    )
    return valid


def test_observed_counters(bulk_raw, valid_specs):
    out, obs = instrumented_indicators(
        bulk_raw, valid_specs, query_hashes=["qh-a", "qh-b"]
    )
    n_out = out.count()  # the action that populates the observation
    m = log_metrics(obs)
    assert m["n_parsed"] == 8
    assert m["n_unsupported_type"] == 1  # cve (F2)
    assert m["n_missing_md5"] == 1  # no-hash.exe (F3)
    assert m["n_indicators"] == 6  # counted pre-spec-join
    assert m["n_rows_qh-a"] == 3
    assert m["n_rows_qh-b"] == 2
    # the invalid spec's row survives the filters but not the spec join
    assert n_out == 5


def test_instrumented_matches_stock_plan(bulk_raw, valid_specs):
    out, _ = instrumented_indicators(bulk_raw, valid_specs)
    stock = generate_indicators(bulk_raw, valid_specs)
    assert out.columns == stock.columns
    key = lambda r: (r.dataset_name, r.atom_type, r.atom_value)  # noqa: E731
    assert sorted(out.collect(), key=key) == sorted(stock.collect(), key=key)
