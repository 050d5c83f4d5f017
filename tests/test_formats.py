"""CSV/ORC source-sink contracts (io/formats.py): exact roundtrips with
hive pruning, delimiter-in-text quoting, corrupt-row quarantine, and the
ORC schema-drift guard."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake2anomali_spark.io.formats import (
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)
from datalake2anomali_spark.io.jsonl import DOCUMENT_SCHEMA
from datalake2anomali_spark.io.tables import load_table


def test_csv_roundtrip_with_quoting_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    # adversarial text: embedded delimiters, quotes, and empty strings
    spiked = docs.limit(50).withColumn(
        "text",
        F.concat(F.lit('a,"b",'), F.col("text"), F.lit(",end")),
    )
    path = str(tmp_path / "docs_csv")
    write_csv(spiked, path, partition_by="lang", n_files=2)

    got = read_csv(spark, path, DOCUMENT_SCHEMA)
    cols = sorted(DOCUMENT_SCHEMA.fieldNames())
    a = spiked.select(*cols)
    b = got.select(*cols)
    assert b.count() == a.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # hive layout: per-lang directories exist -> directory pruning works
    langs = {r[0] for r in spiked.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert dirs == {f"lang={lang}" for lang in langs}
    one = sorted(langs)[0]
    pruned = read_csv(spark, path, DOCUMENT_SCHEMA).filter(F.col("lang") == one)
    assert pruned.count() == spiked.filter(F.col("lang") == one).count()


def test_csv_corrupt_rows_quarantine(spark, tmp_path):
    path = str(tmp_path / "bad_csv")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.csv"), "w") as fh:
        fh.write("doc_id,text,lang,source,n_chars\n")
        fh.write('1,"ok text",en,web,7\n')
        fh.write('not_a_number,"broken",en,web,zzz\n')
        fh.write('3,"fine",de,web,4\n')
    # Spark disallows querying ONLY the corrupt-record column off a raw
    # CSV scan; the documented pattern is to cache the parsed frame first
    got = read_csv(spark, path, DOCUMENT_SCHEMA, keep_corrupt=True).cache()
    ok = got.filter(F.col("_corrupt_record").isNull())
    bad = got.filter(F.col("_corrupt_record").isNotNull())
    assert ok.count() == 2 and bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt_record"]


def test_orc_roundtrip_and_drift_guard(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_orc")
    write_orc(e, path, partition_by="event_date")

    got = read_orc(spark, path)
    cols = sorted(c for c in e.columns if c != "event_date")
    a = e.select(*cols)
    b = got.select(*cols)
    assert b.count() == a.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # expected-schema acceptance and drift refusal
    ok_schema = T.StructType(
        [f for f in e.schema.fields if f.name != "event_date"]
    )
    read_orc(spark, path, expected_schema=ok_schema)
    drifted = T.StructType(
        [*ok_schema.fields, T.StructField("missing_col", T.LongType())]
    )
    with pytest.raises(ValueError, match="missing_col"):
        read_orc(spark, path, expected_schema=drifted)
    wrong_type = T.StructType(
        [
            T.StructField(f.name, T.StringType())
            if f.name == "event_id"
            else f
            for f in ok_schema.fields
        ]
    )
    with pytest.raises(ValueError, match="drifted"):
        read_orc(spark, path, expected_schema=wrong_type)
