"""Trained BPE (llm/bpe.py): hand-computable merges on the classic
fixture, exact detokenization roundtrip, corpus-scale determinism, and
compression vs the character baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.llm.bpe import (
    bpe_tokens_col,
    bpe_train,
    bpe_train_merges,
    decode_tokens,
    encode_word,
)


def test_bpe_merges_on_classic_fixture():
    """Sennrich's low/lower/newest/widest example: the first merges fuse
    the dominant 'est</w>' suffix chain and 'lo' stem."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_merges(wf, n_merges=4)
    # (e,s) and (s,t</w>) both occur 9x; the deterministic tie-break
    # (shortest merged symbol, then lexicographic) fuses 'es' first,
    # then 'est</w>' — the dominant suffix chain either way
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    assert ("l", "o") in merges[:4]

    ranks = {p: i for i, p in enumerate(merges)}
    assert "est</w>" in encode_word("newest", ranks)
    assert decode_tokens(encode_word("newest", ranks)) == "newest"


def test_bpe_corpus_roundtrip_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=100)
    assert len(merges) <= 100 and len(merges) > 10
    # pure function of the corpus: identical under any partitioning
    assert merges == bpe_train(docs.repartition(11), n_merges=100)

    toks = docs.select(
        "doc_id", "text", bpe_tokens_col(F.col("text"), merges).alias("toks")
    )
    sample = toks.orderBy("doc_id").limit(20).collect()
    for r in sample:
        assert decode_tokens(list(r.toks)) == r.text  # exact roundtrip

    # compression: trained merges must beat the per-character baseline
    stats = toks.select(
        F.size("toks").alias("n_bpe"),
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_words"),
    ).agg(F.sum("n_bpe"), F.sum("n_chars"), F.sum("n_words")).collect()[0]
    n_bpe, n_chars, n_words = int(stats[0]), int(stats[1]), int(stats[2])
    assert n_words <= n_bpe < n_chars * 0.6, (n_bpe, n_chars, n_words)


def test_bpe_empty_and_unknown_words():
    merges = bpe_train_merges([("aa", 10)], n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    # a word with no trained merges falls back to characters + sentinel
    assert encode_word("xyz", ranks) == ["x", "y", "z</w>"]
    assert decode_tokens([]) == ""
