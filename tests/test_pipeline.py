"""Composed training-data pipeline (llm/pipeline.py): cleaning chain,
deterministic stratified sampling, corpus stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.llm.pipeline import (
    clean_corpus,
    corpus_stats,
    decontaminate,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    en = "the quick brown fox jumps over the lazy dog and runs off a cliff of doom"
    rows = [
        (1, en),
        (2, en),  # exact duplicate of 1 → dropped (1 survives)
        (3, en + " extra trailing words here now"),  # near-dup of 1 → dropped
        (4, "der hund und die katze das haus und der baum und die sonne und der mond"),  # de
        (5, "the of and a " * 12),  # en but stopword-saturated → low quality
        (6, "a completely different english text with the giant walrus and a small bird of prey"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_chain(docs):
    # 0.4 floor: the 16-token fixtures score ≈0.47 (length term caps at
    # n_tokens/64); the stopword-saturated doc 5 scores 0.375
    out = clean_corpus(docs, lang="en", min_quality=0.4, jaccard_threshold=0.6, max_df=None)
    kept = {r.doc_id for r in out.collect()}
    assert 1 in kept  # smallest id of the dup cluster survives
    assert 2 not in kept  # exact dup
    assert 3 not in kept  # near dup (jaccard vs 1 above threshold)
    assert 4 not in kept  # german
    assert 5 not in kept  # quality floor
    assert 6 in kept


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("other").alias("pred_lang"),
    )
    a = stratified_sample(df, "pred_lang", {"en": 30}, default_pct=10)
    b = stratified_sample(df.repartition(7), "pred_lang", {"en": 30}, default_pct=10)
    sa = {r.doc_id for r in a.collect()}
    sb = {r.doc_id for r in b.collect()}
    assert sa == sb  # partitioning-independent
    n_en = sum(1 for r in a.collect() if r.pred_lang == "en")
    n_other = len(sa) - n_en
    # md5-mod buckets are near-uniform: 30%±5 of 1000, 10%±4 of 1000
    assert 250 <= n_en <= 350
    assert 60 <= n_other <= 140


def test_stratified_sample_zero_and_full(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("pred_lang")
    )
    assert stratified_sample(df, "pred_lang", {"x": 0}).count() == 0
    assert stratified_sample(df, "pred_lang", {"x": 100}).count() == 100


def test_decontaminate_planted_overlap(spark):
    # md5-bucket(doc_id) < 50 decides the benchmark split; find one id on
    # each side, plant a shared 8-gram, and assert only the training-side
    # doc with the overlap is flagged.
    from datalake2anomali_spark.llm.pipeline import md5_bucket_col

    ids = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    sides = {
        r.doc_id: r.b for r in ids.select("doc_id", md5_bucket_col().alias("b")).collect()
    }
    bench_id = next(i for i, b in sides.items() if b < 50)
    train_hit = next(i for i, b in sides.items() if b >= 50)
    train_clean = next(i for i, b in sides.items() if b >= 50 and i != train_hit)
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (bench_id, "prefix " + shared + " suffix"),
        (train_hit, "other words then " + shared + " trailing"),
        (train_clean, "absolutely nothing in common with anything else at all zero overlap ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = decontaminate(df, benchmark_pct=50, n=8).collect()
    assert len(out) == 1
    assert out[0].doc_id == train_hit
    assert out[0].n_overlap_ngrams == 1 and out[0].n_benchmark_docs == 1


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    from datalake2anomali_spark.io.tables import load_table

    df = decontaminate(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # bench index never shuffles the corpus


def test_pack_sequences_offsets(spark):
    from datalake2anomali_spark.llm.pipeline import pack_sequences

    rows = [
        (1, "s1", "a b c d"),        # 4 tokens, start 0, seq 0
        (2, "s1", "e f g"),          # start 4, spans 4..6 → crosses at L=6
        (3, "s1", "h i"),            # start 7, seq 1
        (10, "s2", "x y z"),         # independent shard: start 0 again
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in pack_sequences(df, seq_len=6).collect()}
    assert out[1].token_start == 0 and out[1].seq_id == 0 and not out[1].crosses_boundary
    assert out[2].token_start == 4 and out[2].seq_id == 0 and out[2].crosses_boundary
    assert out[3].token_start == 7 and out[3].seq_id == 1 and not out[3].crosses_boundary
    assert out[10].token_start == 0 and out[10].seq_id == 0


def test_corpus_stats_shape(docs):
    out = {r.pred_lang: r for r in corpus_stats(docs).collect()}
    assert out["en"].n_docs == 5
    assert out["de"].n_docs == 1
    assert out["en"].total_tokens > 0
    assert 0.0 < out["en"].avg_quality <= 1.0


def test_chunk_documents_spans_and_text(spark):
    from datalake2anomali_spark.llm.pipeline import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(df, chunk_len=5, overlap=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> ceil(8/3) = 3 chunks at starts 0, 3, 6
    assert {(1, 0), (1, 1), (1, 2), (2, 0)} == set(rows)
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3 t4"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6 t7"   # 2-token overlap
    assert rows[(1, 2)].chunk_text == "t6 t7 t8 t9"      # tail, 4 tokens
    assert rows[(1, 2)].token_start == 6 and rows[(1, 2)].chunk_tokens == 4
    # every token covered exactly once by non-overlap positions
    assert rows[(2, 0)].chunk_text == "short doc"
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_len=4, overlap=4)


def test_mixture_sample_rebalances_and_is_deterministic(spark):
    from datalake2anomali_spark.llm.pipeline import mixture_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, strata_col="source", alpha=0.5).cache()
    by_src = {r.source: r.cnt for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # alpha=0.5: p(big) = 30/(30+10) = .75 -> ~750 copies; p(small) = .25 -> ~250
    # (small is upsampled 2.5x: whole copies + deterministic fractional part)
    assert 700 <= by_src["big"] <= 800
    assert 220 <= by_src["small"] <= 280
    # total stays ~ input size
    assert 900 <= by_src["big"] + by_src["small"] <= 1100
    # deterministic across re-evaluation
    again = mixture_sample(df, strata_col="source", alpha=0.5)
    assert out.unpersist().exceptAll(again).count() == 0
    with pytest.raises(ValueError):
        mixture_sample(df, alpha=0.9)


def test_weighted_sample_exact_size_and_bias(spark, sf_dir):
    """A-ES sampling: exactly k rows per stratum, deterministic across
    partitionings, weight-biased (high-weight rows overrepresented vs
    their population share), and zero/NULL weights never drawn."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.tables import load_table
    from datalake2anomali_spark.llm.pipeline import weighted_sample_exact

    docs = load_table(spark, sf_dir, "documents")
    wt = F.when(F.col("doc_id") % 10 == 0, F.lit(50.0)).otherwise(F.lit(1.0))
    k = 20

    s1 = weighted_sample_exact(docs, k, wt, strata_col="lang")
    sizes = {r.lang: r.n for r in s1.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    pop = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in sizes.items():
        assert n == min(k, pop[lang]), (lang, n)

    # deterministic: identical ids under any partitioning
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    s2 = weighted_sample_exact(docs.repartition(13), k, wt, strata_col="lang")
    assert ids1 == sorted(r.doc_id for r in s2.select("doc_id").collect())

    # weight bias: doc_id%10==0 is 10% of the population but 50x-weighted,
    # so its sample share must be far above 10%
    n_hot = sum(1 for d in ids1 if d % 10 == 0)
    assert n_hot / len(ids1) > 0.3, n_hot / len(ids1)

    # excluded weights can never be drawn
    wt0 = F.when(F.col("doc_id") % 2 == 0, F.lit(None).cast("double")).otherwise(
        F.when(F.col("doc_id") % 3 == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    s3 = weighted_sample_exact(docs, 50, wt0)
    bad = s3.filter((F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0))
    assert bad.count() == 0
