"""Lexical relevance scoring: BM25 over the documents corpus.

The Robertson/Lucene BM25 form:

    score(D, Q) = Σ_t  idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale design: for a FIXED query-term set (the online-search shape), the
corpus statistics (N, avgdl, per-term df) reduce to ONE tiny aggregate row
— each df is a ``sum(array_contains)`` over the same scan, so the stats
pass is a single map-side-combined aggregation, no explode, no per-term
shuffle.  The scoring pass is then map-only: every per-document quantity
(tf, |D|) is row-local, the stats row rides in via a 1-row broadcast cross
join.  Two scans total at any corpus size, both fully codegen'd.

A full search engine would materialize an inverted index instead (the
``dedup.shingle_index`` shape); this operator is the query-time scorer.
Scores round to 6 digits so JVM/libm ``ln`` ulp differences cannot leak
into cross-engine comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (docs with score 0 are
    dropped — they match no term).  Returns (doc_id, n_matched, score)."""
    toks = tokens_col(text_col)
    stats_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_len"),
    ]
    for i, t in enumerate(query_terms):
        stats_aggs.append(
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"df_{i}")
        )
    stats = docs.agg(*stats_aggs)

    scored = docs.select("doc_id", toks.alias("toks")).crossJoin(F.broadcast(stats))
    dl = F.size("toks").cast("double")
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl)
    score = F.lit(0.0)
    n_matched = F.lit(0)
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        n_matched = n_matched + F.array_contains("toks", t).cast("int")
    return (
        scored.select(
            "doc_id",
            n_matched.alias("n_matched"),
            F.round(score, round_digits).alias("score"),
        )
        .filter(F.col("n_matched") > 0)
    )
