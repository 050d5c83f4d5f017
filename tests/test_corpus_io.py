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
