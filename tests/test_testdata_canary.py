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


def test_loader_absorbs_every_physical_ts_encoding(spark, tmp_path):
    """The loader must yield identical TimestampType instants whatever
    physical type a future testdata regeneration writes — NANOS (the
    rounds-1-2 encoding, currently exercised nowhere else since the data
    flipped to MICROS), MICROS, and MILLIS."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    us_vals = [1704067207179575, 1706655976220708]
    results = {}
    for unit, factor in [("ns", 1000), ("us", 1), ("ms", 0)]:
        vals = [v * factor for v in us_vals] if factor else [v // 1000 for v in us_vals]
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(vals, pa.timestamp(unit)),
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["click", "error"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        sub = tmp_path / unit
        sub.mkdir()
        pq.write_table(t, str(sub / "events.parquet"))
        df = load_table(spark, str(sub), "events")
        assert df.schema["ts"].dataType == T.TimestampType(), unit
        results[unit] = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert results["ns"] == results["us"]
    # ms-written values were truncated at write; compare at ms precision
    assert [t.replace(microsecond=t.microsecond // 1000 * 1000) for t in results["us"]] == results["ms"]


def test_events_ts_values_plausible(spark, sf_dir):
    """Value-level canary: normalized events.ts instants land in a sane year
    range.

    The dtype checks above are type-level only — if the generator ever writes
    ``ts`` as a *bare* int64 of epoch-MICROseconds (no timestamp logical
    type), the LongType branch of normalize_events_ts would treat it as
    nanoseconds and divide by 1000, shifting every instant to ~1970 while
    both type canaries still pass.  Bounding min/max to [2000, 2100] catches
    that silent ÷1000 (and a ×1000 in the other direction) before any query
    runs.
    """
    import datetime as dt

    lo, hi = dt.datetime(2000, 1, 1), dt.datetime(2100, 1, 1)
    row = (
        load_table(spark, sf_dir, "events")
        .selectExpr("min(ts) as lo", "max(ts) as hi")
        .collect()[0]
    )
    assert lo <= row.lo <= row.hi <= hi, (
        f"events.ts values implausible after normalization: min={row.lo} max={row.hi} — "
        "likely a unit mismatch (bare int64 micros read as nanos, or vice versa); "
        "check io/tables.py:normalize_events_ts against the regenerated testdata"
    )


@pytest.mark.parametrize("other_sf", ["/root/testdata/sf0.01"])
def test_canary_holds_at_gate_sf(spark, other_sf):
    """The driver gates at sf0.01 and benches at sf0.1 — check one non-test SF
    so drift that only hit regenerated larger files is still caught."""
    t = {f.name: f.dataType for f in load_table(spark, other_sf, "events").schema.fields}
    assert t["ts"] == T.TimestampType(), f"sf0.01 events.ts normalized to {t['ts']}"
