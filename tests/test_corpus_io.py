"""Corpus writer layout tests (io/corpus.py): hive partitioning, per-file
range disjointness, partition pruning on read-back."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake2anomali_spark.io.corpus import read_corpus, write_corpus
from datalake2anomali_spark.io.tables import load_table


def test_write_corpus_layout_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, partition_by="lang", n_files=4)

    # hive layout: one directory per language
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={v}" for v in langs}

    back = read_corpus(spark, out)
    assert back.count() == docs.count()

    # range clustering: within each partition, per-file doc_id ranges are
    # disjoint (this is what makes parquet min/max stats prune id ranges)
    per_file = (
        back.groupBy("lang", F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in per_file:
        by_lang.setdefault(r.lang, []).append((r.lo, r.hi))
    for spans in by_lang.values():
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, f"overlapping file ranges: {spans}"

    # partition pruning: a lang filter must reach PartitionFilters, and the
    # scan must not read the other directories
    one = sorted(langs)[0]
    plan = (
        back.filter(F.col("lang") == one)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan


def test_jsonl_roundtrip_and_corrupt_record_capture(spark, tmp_path):
    """Writer partitions+compresses; schema-explicit reader round-trips
    values and captures malformed lines instead of failing the scan."""
    import gzip
    import os

    from datalake2anomali_spark.io.jsonl import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en", "web", 11), (2, "bonjour", "fr", "web", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "jl")
    write_jsonl(df, path, partition_by="lang", n_files=1)
    # hive layout + gzip on disk
    assert os.path.isdir(os.path.join(path, "lang=en"))
    files = [
        f for f in os.listdir(os.path.join(path, "lang=en")) if f.endswith(".gz")
    ]
    assert files
    back = read_jsonl(spark, path)
    rows = {r.doc_id: r for r in back.collect()}
    assert rows[1].text == "hello world" and rows[1].lang == "en"
    assert rows[2].n_chars == 7 and rows[2].lang == "fr"
    # plant a malformed line in a new partition file
    bad_dir = os.path.join(path, "lang=xx")
    os.makedirs(bad_dir)
    with gzip.open(os.path.join(bad_dir, "part-bad.json.gz"), "wt") as f:
        f.write('{"doc_id": 3, "text": "ok"}\n')
        f.write("{not json at all\n")
    kept = read_jsonl(spark, path, keep_corrupt=True)
    bad = kept.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith("{not json")
    good = kept.filter("_corrupt_record IS NULL AND lang = 'xx'").collect()
    assert len(good) == 1 and good[0].doc_id == 3
