"""Deterministic negative sampling (llm/contrastive.py): engine-portable
draws (Spark == DuckDB replay), positive/self exclusion, shortfall
visibility."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.llm.contrastive import (
    negative_samples,
    negative_samples_sql,
)

K = 4


def test_matches_duckdb_replay(spark, sf_dir):
    """The Spark sample must be bit-identical to the oracle SQL's replay
    of the same md5 draws over the same dense index."""
    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % 10 == 0)
    got = {
        (r["doc_id"], r["neg_id"], r["draw"], r["n_drawn"])
        for r in negative_samples(anchors, docs, K).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(
            negative_samples_sql(K, anchor_filter="doc_id % 10 = 0")
        ).fetchall()
    }
    assert got == want
    n_anchors = anchors.count()
    assert len(got) == n_anchors * K  # corpus >> k: every anchor filled


def test_excludes_positives_self_and_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") < 50)
    # declare each anchor's two successors as positives (positional pairs)
    pos = anchors.select(
        F.col("doc_id"), (F.col("doc_id") + 1).alias("pos_id")
    ).unionByName(
        anchors.select(F.col("doc_id"), (F.col("doc_id") + 2).alias("pos_id"))
    )

    rows = negative_samples(anchors, docs, K, positives=pos).collect()
    banned = {(r["doc_id"], r["pos_id"]) for r in pos.collect()}
    assert rows
    for r in rows:
        assert r["neg_id"] != r["doc_id"]
        assert (r["doc_id"], r["neg_id"]) not in banned
        assert r["draw"] <= K
    again = negative_samples(anchors, docs, K, positives=pos)
    assert {tuple(r) for r in rows} == {tuple(r) for r in again.collect()}


def test_small_corpus_shortfall_is_visible(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tiny = docs.filter(F.col("doc_id") < 3)  # corpus of 3
    anchors = tiny
    out = negative_samples(anchors, tiny, k=5, oversample=4).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["doc_id"], set()).add(r["neg_id"])
        assert r["neg_id"] != r["doc_id"]
        assert r["n_drawn"] <= 2  # only 2 possible negatives exist
    for a, negs in by_anchor.items():
        assert len(negs) <= 2


def test_rejects_bad_arguments(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match=">= 1"):
        negative_samples(docs, docs, 0)
    with pytest.raises(ValueError, match="empty"):
        negative_samples(docs, docs.filter(F.lit(False)), 2)


def test_starved_anchor_is_visible_with_zero_count(spark, sf_dir):
    """An anchor whose every draw is self or a positive must still appear
    as one (anchor, NULL, NULL, 0) row — never silently vanish."""
    docs = load_table(spark, sf_dir, "documents")
    pair = docs.filter(F.col("doc_id") < 2)  # corpus of exactly 2
    # each anchor declares the only other doc a positive → zero negatives
    pos = pair.select(
        F.col("doc_id"), (F.lit(1) - F.col("doc_id")).alias("pos_id")
    )
    rows = negative_samples(pair, pair, k=3, positives=pos).collect()
    assert {r["doc_id"] for r in rows} == {0, 1}
    for r in rows:
        assert r["neg_id"] is None and r["draw"] is None
        assert r["n_drawn"] == 0
