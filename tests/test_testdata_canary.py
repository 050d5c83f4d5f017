"""Testdata schema canary: fail loudly, by name, when the driver regenerates
the parquet testdata with different physical types.

Round 3 died because ``events.ts`` silently flipped TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) between rounds and every failure surfaced as an opaque
``DATATYPE_MISMATCH`` deep inside a query plan (10 errored queries, 3 silent
wrong answers, a crashed bench).  This test runs the same scans the engine
runs and asserts, per table/column the engine *normalizes or depends on*,
that the scanned dtype is one the code knows how to handle — and names the
drifted column in the failure message before any query logic is involved.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import types as T

from datalake2anomali_spark.io.tables import TABLES, load_table

# Scanned (post-load_table) dtypes the engine is written against.  A set per
# column = every physical encoding normalize_events_ts knows how to absorb.
_EXPECTED = {
    "events": {
        "event_id": {T.LongType()},
        "ts": {T.TimestampType()},  # load_table normalizes every physical type here
        "user_id": {T.LongType()},
        "event_type": {T.StringType()},
        "value": {T.DoubleType()},
    },
    "documents": {
        "doc_id": {T.LongType()},
        "text": {T.StringType()},
    },
    "embeddings": {
        "vec_id": {T.LongType()},
        "embedding": {T.ArrayType(T.FloatType()), T.ArrayType(T.DoubleType())},
    },
    "lineitem": {
        "l_orderkey": {T.LongType()},
        "l_quantity": {T.DoubleType()},
        "l_shipdate": {T.DateType(), T.TimestampType(), T.TimestampNTZType()},
    },
    "orders": {
        "o_orderkey": {T.LongType()},
        "o_orderdate": {T.DateType(), T.TimestampType(), T.TimestampNTZType()},
    },
}


def test_all_tables_scan(spark, sf_dir):
    """Every table the loaders claim exists actually scans."""
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert len(df.schema.fields) > 0, f"{name}: empty schema"


def test_normalized_dtypes(spark, sf_dir):
    drifted = []
    for table, cols in _EXPECTED.items():
        schema = {f.name: f.dataType for f in load_table(spark, sf_dir, table).schema.fields}
        for col, allowed in cols.items():
            actual = schema.get(col)
            if actual is None:
                drifted.append(f"{table}.{col}: column MISSING from scan")
            elif actual not in allowed:
                drifted.append(
                    f"{table}.{col}: scans as {actual.simpleString()}, engine expects one of "
                    f"{sorted(t.simpleString() for t in allowed)}"
                )
    assert not drifted, (
        "TESTDATA SCHEMA DRIFT — the driver regenerated parquet with new types; "
        "update io/tables.py normalization first:\n  " + "\n  ".join(drifted)
    )


def test_events_physical_ts_is_known(sf_dir):
    """Pin the *physical* parquet type of events.ts (pyarrow view, no Spark).

    normalize_events_ts handles NANOS (as long), MICROS/MILLIS (NTZ), and
    UTC-adjusted timestamps.  Anything else (e.g. the generator switching to
    INT96 or a string) should fail here with the physical type in the message.
    """
    field = pq.read_schema(f"{sf_dir}/events.parquet").field("ts")
    t = field.type
    assert str(t).startswith("timestamp") or str(t) in ("int64", "int96"), (
        f"events.ts physical type drifted to {t!r}; "
        "extend io/tables.py:normalize_events_ts before anything else"
    )


@pytest.mark.parametrize("other_sf", ["/root/testdata/sf0.01"])
def test_canary_holds_at_gate_sf(spark, other_sf):
    """The driver gates at sf0.01 and benches at sf0.1 — check one non-test SF
    so drift that only hit regenerated larger files is still caught."""
    t = {f.name: f.dataType for f in load_table(spark, other_sf, "events").schema.fields}
    assert t["ts"] == T.TimestampType(), f"sf0.01 events.ts normalized to {t['ts']}"
