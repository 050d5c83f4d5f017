"""Physical-plan shape guards — the scale claims in docs/SCALE.md, enforced.

Each test pins the exchange count of a plan whose shape is a design
guarantee (map-only EP-A, single-shuffle aggregations, broadcast-only
joins).  A regression that adds a shuffle to one of these is a scale bug
even if every value stays correct, so it should fail CI, not wait for a
100 TB run to expose it.
"""

from __future__ import annotations

import pytest

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.llm.pipeline import corpus_stats
from datalake2anomali_spark.llm.text import repetition_stats, text_stats, token_counts
from datalake2anomali_spark.plans import ioc_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(df) -> int:
    return _plan(df).count("Exchange hashpartitioning")


def test_ep_a_is_map_only(spark, sf_dir):
    # The flagship IOC pipeline: every join broadcasts a config-sized dim,
    # so the whole plan must contain ZERO hash-partition exchanges
    # (docs/SCALE.md "0 shuffles, 3 broadcast exchanges").
    df = ioc_queries.ioc_indicators(spark, sf_dir)
    p = _plan(df)
    assert p.count("Exchange hashpartitioning") == 0, p
    assert "BroadcastExchange" in p


def test_text_kernels_are_map_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert _n_shuffles(text_stats(docs)) == 0
    assert _n_shuffles(token_counts(docs)) == 0
    # the per-doc mode count must come from the row-local run-length pass,
    # not an explode + groupBy
    assert _n_shuffles(repetition_stats(docs)) == 0


def test_corpus_stats_single_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert _n_shuffles(corpus_stats(docs)) == 1


def test_normalize_and_scrub_are_map_only(spark, sf_dir):
    from datalake2anomali_spark.llm.text import normalize_text, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    assert _n_shuffles(normalize_text(docs)) == 0
    assert _n_shuffles(scrub_pii(docs)) == 0


def test_pack_sequences_single_exchange(spark, sf_dir):
    # one hash exchange for the per-shard window; a global sort (range
    # exchange) would mean the formulation serialized the corpus
    from datalake2anomali_spark.llm.pipeline import pack_sequences

    df = pack_sequences(load_table(spark, sf_dir, "documents"))
    p = _plan(df)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Exchange rangepartitioning" not in p, p


def test_no_cartesian_products_in_registered_queries(spark, sf_dir):
    # CartesianProduct = the unbounded O(n^2) plan Spark falls back to for
    # non-equi self-joins.  Only brute-force *verification* twins may use a
    # broadcast nested loop; a CartesianProduct anywhere is a bug.
    # Same loop also pins Python evaluation to the Arrow path:
    # BatchEvalPython is the row-at-a-time pickle bridge (10-100x slower
    # than ArrowEvalPython at 100 TB) and must never appear.
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        if name.startswith("stream_") or name == "stateful_user_profiles":
            continue  # streaming plans materialize through their own runner
        df = fn(spark, sf_dir)
        p = _plan(df)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, (
            f"{name}: row-at-a-time Python UDF in the plan"
        )


def test_chunk_documents_is_map_only(spark, sf_dir):
    # tokenize -> sequence -> posexplode -> slice: no exchange of any kind
    from datalake2anomali_spark.llm.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    assert _n_shuffles(chunk_documents(docs)) == 0


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    # the corpus-sized side must never shuffle: the only hash exchange is
    # the tiny per-stratum count aggregation; the rate table joins back as
    # a broadcast
    from datalake2anomali_spark.llm.pipeline import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    df = mixture_sample(docs, strata_col="source")
    p = _plan(df)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p, p
    # exactly two scans: the counts aggregation and the corpus pass — the
    # totals must come from a window over the counts, not a re-aggregation
    assert p.count("FileScan") == 2, p


def test_top_terms_uses_takeordered(spark, sf_dir):
    # the top-k must be per-partition heaps merged on the driver, not a
    # full sort of the vocabulary
    from datalake2anomali_spark.llm.text import top_terms

    docs = load_table(spark, sf_dir, "documents")
    p = _plan(top_terms(docs, k=10))
    assert "TakeOrderedAndProject" in p, p
